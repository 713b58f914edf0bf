"""Micro-profile of the penalized Gaussian hot path on the attached chip.

Breaks one plbfgs iteration's cost into parts for the bench workload
(N=500, B outcomes, exact_mll objective):
  - gram assembly alone (batched over outcomes)
  - cholesky + cho_solve given K
  - full exact_mll forward (vmapped)
  - grad of exact_mll (vmapped)
  - CG-based solve (matmul-only alternative)

Run: python tools/profile_hotpath.py [B]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    import waveome_tpu
    from waveome_tpu.kernels import full_kernel_build
    from waveome_tpu.kernels.gram import gram
    from waveome_tpu.models import svgp

    waveome_tpu.set_precision("float32")
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    N = 500

    from bench import simulate

    X_np, Ys_np = simulate(n_outcomes=B)
    spec, _ = full_kernel_build(
        cat_vars=[0, 2], num_vars=[1], unit_idx=0,
        var_names=["id", "time", "female"], return_sum=True,
    )
    config = svgp.make_config(spec, "gaussian", num_data=N, input_dim=3,
                              num_inducing_points=N)
    dtype = jnp.float32
    X = jnp.asarray(X_np, dtype=dtype)
    Ys = jnp.asarray(Ys_np.T[:, :, None], dtype=dtype)  # (B, N, 1)
    p0 = svgp.init_params(config, X, key=jax.random.PRNGKey(0), dtype=dtype)
    pB = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), p0)
    # perturb so batch members differ
    pB = dict(pB)
    pB["kernel_raw"] = pB["kernel_raw"] + 0.01 * jax.random.normal(
        jax.random.PRNGKey(1), pB["kernel_raw"].shape, dtype=dtype)

    print(f"B={B} N={N} C={config.num_components} "
          f"devices={jax.devices()}", file=sys.stderr)

    # 1. gram assembly
    gram_fn = jax.jit(jax.vmap(
        lambda p: gram(config.spec, p["kernel_raw"], X, X)))
    t = timeit(gram_fn, pB)
    print(f"gram assembly (B,{N},{N}):          {t*1e3:8.1f} ms")

    Ks = gram_fn(pB)
    noise = 0.1

    # 2. cholesky + solve given K
    def chol_solve(K, y):
        Ky = K + noise * jnp.eye(N, dtype=dtype)
        L = jnp.linalg.cholesky(Ky)
        a = jax.scipy.linalg.cho_solve((L, True), y[:, 0])
        return jnp.sum(y[:, 0] * a) + 2 * jnp.sum(jnp.log(jnp.diag(L)))

    chol_fn = jax.jit(jax.vmap(chol_solve))
    t = timeit(chol_fn, Ks, Ys)
    print(f"cholesky+cho_solve given K:          {t*1e3:8.1f} ms")

    # 3. full exact_mll forward
    mll_fn = jax.jit(jax.vmap(
        lambda p, y: svgp.exact_mll(config, p, X, y)))
    t = timeit(mll_fn, pB, Ys)
    print(f"exact_mll forward:                   {t*1e3:8.1f} ms")

    # 4. grad of exact_mll (w.r.t. kernel_raw + lik_raw only, like plbfgs)
    def loss(kraw, lraw, p, y):
        q = dict(p, kernel_raw=kraw, lik_raw=lraw)
        return -svgp.exact_mll(config, q, X, y)

    grad_fn = jax.jit(jax.vmap(
        jax.grad(loss, argnums=(0, 1)), in_axes=(0, 0, 0, 0)))
    t = timeit(grad_fn, pB["kernel_raw"], pB["lik_raw"], pB, Ys)
    print(f"grad exact_mll:                      {t*1e3:8.1f} ms")

    # 5. CG solve (matmul-only): K^-1 [y, probes] via batched CG
    n_probe = 8
    n_cg = 30
    key = jax.random.PRNGKey(2)
    Z = jax.random.rademacher(key, (B, N, n_probe), dtype=dtype)

    def cg_solve(K, rhs):
        Ky = K + noise * jnp.eye(N, dtype=dtype)

        def body(i, carry):
            x, r, p, rs = carry
            Kp = Ky @ p
            alpha = rs / jnp.maximum(jnp.sum(p * Kp, axis=0), 1e-30)
            x = x + alpha * p
            r = r - alpha * Kp
            rs_new = jnp.sum(r * r, axis=0)
            beta = rs_new / jnp.maximum(rs, 1e-30)
            p = r + beta * p
            return x, r, p, rs_new

        x0 = jnp.zeros_like(rhs)
        carry = (x0, rhs, rhs, jnp.sum(rhs * rhs, axis=0))
        x, *_ = jax.lax.fori_loop(0, n_cg, body, carry)
        return x

    rhs = jnp.concatenate([Ys, Z], axis=2)  # (B, N, 1+n_probe)
    cg_fn = jax.jit(jax.vmap(cg_solve))
    t = timeit(cg_fn, Ks, rhs)
    print(f"CG solve ({n_cg} iters, {1+n_probe} rhs):       {t*1e3:8.1f} ms")

    # 6. one full plbfgs-equivalent iteration estimate:
    # 6 trial forwards + 1 grad
    t_fwd = timeit(mll_fn, pB, Ys)
    print(f"est. plbfgs iter (6 fwd + 1 grad):   "
          f"{(6*t_fwd)*1e3:8.1f} ms fwd part")


if __name__ == "__main__":
    main()
