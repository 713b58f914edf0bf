"""Measure per-outcome convergence iteration distribution on the bench
workload + CG-MLL accuracy at realistic (optimized) hyperparameters.

Run: python tools/profile_convergence.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import waveome_tpu
    from waveome_tpu.fit import fit_outcomes_penalized
    from waveome_tpu.kernels import full_kernel_build
    from waveome_tpu.kernels.gram import gram
    from waveome_tpu.models import svgp

    waveome_tpu.set_precision("float32")
    from bench import simulate

    B = 256
    X, Ys = simulate(n_outcomes=B)
    spec, _ = full_kernel_build(
        cat_vars=[0, 2], num_vars=[1], unit_idx=0,
        var_names=["id", "time", "female"], return_sum=True,
    )
    t0 = time.time()
    res = fit_outcomes_penalized(
        X, Ys, spec=spec, likelihood="gaussian",
        num_inducing_points=X.shape[0], num_factor_iter=0, max_iter=200,
        use_mesh=False, device_chunk=8,
    )
    jax.block_until_ready(res.results.loss)
    print(f"fit elapsed {time.time()-t0:.1f}s")
    iters = np.asarray(res.results.num_iters)
    print("num_iters percentiles:",
          {q: int(np.percentile(iters, q)) for q in (10, 25, 50, 75, 90, 95,
                                                     99, 100)})
    print("converged frac at 200:", float(np.mean(iters < 200)))

    # --- CG accuracy at the OPTIMIZED hyperparameters ---
    config = res.config
    N = X.shape[0]
    dtype = jnp.float32
    Xd = jnp.asarray(X, dtype=dtype)
    params = res.results.params  # (B, ...) pytree

    def mk_K(p):
        return gram(config.spec, p["kernel_raw"], Xd, Xd)

    Ks = jax.jit(jax.vmap(mk_K))(params)
    noises = jax.vmap(
        lambda p: config.likelihood.constrain(p["lik_raw"])[0])(params)
    Ys_d = jnp.asarray(Ys.T, dtype=dtype)

    def exact_parts(K, noise, y):
        Ky = K + noise * jnp.eye(N, dtype=dtype)
        L = jnp.linalg.cholesky(Ky)
        a = jax.scipy.linalg.cho_solve((L, True), y)
        return jnp.sum(y * a), 2.0 * jnp.sum(jnp.log(jnp.diag(L)))

    quad_e, logdet_e = jax.jit(jax.vmap(exact_parts))(Ks, noises, Ys_d)

    # CG + Lanczos-SLQ
    n_probe, n_cg = 8, 30
    key = jax.random.PRNGKey(0)
    Z = jax.random.rademacher(key, (N, n_probe), dtype=dtype)

    def cg_lanczos(K, noise, y):
        Ky = K + noise * jnp.eye(N, dtype=dtype)
        rhs = jnp.concatenate([y[:, None], Z], axis=1)  # (N, 1+s)
        nrhs = 1 + n_probe

        def body(carry, _):
            x, r, p, rs, alpha_prev, beta_prev = carry
            Kp = Ky @ p
            pKp = jnp.sum(p * Kp, axis=0)
            alpha = rs / jnp.maximum(pKp, 1e-30)
            x = x + alpha * p
            r2 = r - alpha * Kp
            rs2 = jnp.sum(r2 * r2, axis=0)
            beta = rs2 / jnp.maximum(rs, 1e-30)
            p2 = r2 + beta * p
            return ((x, r2, p2, rs2, alpha, beta),
                    (alpha, beta))

        x0 = jnp.zeros_like(rhs)
        carry0 = (x0, rhs, rhs, jnp.sum(rhs * rhs, axis=0),
                  jnp.ones(nrhs, dtype=dtype), jnp.zeros(nrhs, dtype=dtype))
        (x, *_), (alphas, betas) = jax.lax.scan(body, carry0, None,
                                                length=n_cg)
        quad = jnp.sum(y * x[:, 0])
        # Lanczos T from CG coefficients (probes only)
        a = alphas[:, 1:]  # (n_cg, s)
        b = betas[:, 1:]
        diag = 1.0 / jnp.maximum(a, 1e-30)
        diag = diag.at[1:].add(b[:-1] / jnp.maximum(a[:-1], 1e-30))
        off = jnp.sqrt(jnp.maximum(b[:-1], 0.0)) / jnp.maximum(a[:-1],
                                                               1e-30)
        T = (jnp.zeros((n_probe, n_cg, n_cg), dtype=dtype)
             + jax.vmap(jnp.diag)(diag.T)
             + jax.vmap(lambda o: jnp.diag(o, 1))(off.T)
             + jax.vmap(lambda o: jnp.diag(o, -1))(off.T))
        w, V = jnp.linalg.eigh(T)
        w = jnp.maximum(w, 1e-30)
        tau = V[:, 0, :] ** 2  # (s, n_cg) first-row components
        ld_each = jnp.sum(tau * jnp.log(w), axis=1) * N
        return quad, jnp.mean(ld_each)

    quad_c, logdet_c = jax.jit(jax.vmap(cg_lanczos))(Ks, noises, Ys_d)

    qe, qc = np.asarray(quad_e), np.asarray(quad_c)
    le, lc = np.asarray(logdet_e), np.asarray(logdet_c)
    mll_err = 0.5 * np.abs((qc - qe) + (lc - le))
    print("noise percentiles:",
          {q: float(np.percentile(np.asarray(noises), q))
           for q in (0, 50, 100)})
    print("quad rel err:  med {:.2e} p95 {:.2e} max {:.2e}".format(
        *np.percentile(np.abs(qc - qe) / np.maximum(np.abs(qe), 1), [50, 95, 100])))
    print("logdet abs err: med {:.2e} p95 {:.2e} max {:.2e}".format(
        *np.percentile(np.abs(lc - le), [50, 95, 100])))
    print("0.5*(quad+logdet) abs err (MLL units): med {:.3f} p95 {:.3f} "
          "max {:.3f}".format(*np.percentile(mll_err, [50, 95, 100])))


if __name__ == "__main__":
    main()
