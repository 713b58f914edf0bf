"""Where does the penalized-fit loss plateau? Runs the segmented Gaussian
fit in 10-iter segments and prints per-segment relative improvement
quantiles, to size an ftol-style convergence criterion.

Run: python tools/profile_plateau.py
"""

import os
import sys

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
    from waveome_tpu.fit.batch import _segmented_gaussian_fit  # noqa
    from waveome_tpu.fit.penalized import auto_penalization_factor
    from waveome_tpu.kernels import full_kernel_build
    from waveome_tpu.models import svgp
    from waveome_tpu.optimize.plbfgs import plbfgs_fit

    waveome_tpu.set_precision("float32")
    from bench import simulate

    B = 256
    N = 500
    X_np, Ys_np = simulate(n_outcomes=B)
    spec, _ = full_kernel_build(
        cat_vars=[0, 2], num_vars=[1], unit_idx=0,
        var_names=["id", "time", "female"], return_sum=True,
    )
    dtype = jnp.float32
    config = svgp.make_config(spec, "gaussian", num_data=N, input_dim=3,
                              num_inducing_points=N)
    X = jnp.asarray(X_np, dtype=dtype)
    p0 = svgp.init_params(config, X, key=jax.random.PRNGKey(0), dtype=dtype)
    num_var = config.spec.num_variance_prior_params()
    factor = float(auto_penalization_factor(1.0, N, num_var))

    mask = jax.tree.map(np.asarray, svgp.train_mask(config, p0))
    for k in ("q_mu", "q_sqrt_raw", "z"):
        mask[k] = np.zeros_like(mask[k])

    var_cap = 1e3

    def make_loss(y):
        def loss(p):
            obj = svgp.exact_mll(config, p, X, y) + svgp.log_prior_density(
                config, p, factor)
            from waveome_tpu.kernels.gram import component_variances as _cv
            v = _cv(config.spec, p["kernel_raw"])
            obj = obj - jnp.sum(jax.nn.relu(v - var_cap) ** 2)
            return -obj
        return loss

    def seg(carry, y, bound):
        return plbfgs_fit(make_loss(y), p0, mask=mask, max_iter=bound,
                          tol=3e-5, carry=carry, return_carry=True)

    def first(y, bound):
        return plbfgs_fit(make_loss(y), p0, mask=mask, max_iter=bound,
                          tol=3e-5, return_carry=True)

    first_fn = jax.jit(jax.vmap(first, in_axes=(0, None)))
    next_fn = jax.jit(jax.vmap(seg, in_axes=(0, 0, None)))

    Ys = jnp.asarray(Ys_np.T[:, :, None], dtype=dtype)
    SEG = 10
    res, carry = first_fn(Ys, jnp.asarray(SEG))
    losses = [np.asarray(res.loss)]
    for b in range(2 * SEG, 201, SEG):
        res, carry = next_fn(carry, Ys, jnp.asarray(b))
        losses.append(np.asarray(res.loss))
    L = np.stack(losses)  # (n_seg, B)
    final = L[-1]
    print("iters  med_rel_gap_to_final  p90_gap  frac_within_1e-5")
    for i in range(L.shape[0]):
        gap = (L[i] - final) / np.maximum(np.abs(final), 1.0)
        print(f"{(i+1)*SEG:5d}  {np.median(gap):.3e}  "
              f"{np.percentile(gap, 90):.3e}  "
              f"{np.mean(gap < 1e-5):.2f}")


if __name__ == "__main__":
    main()
