"""On-chip verification of the fused Pallas gram (compiled, non-interpret).

Checks, against the pure-XLA gram on the attached TPU:
  1. forward values (single call, vmap, NESTED vmap),
  2. gradients of an exact-MLL loss through the custom-VJP wrapper
     (vmapped, at the init point and at stepped points).

Known issue this script does NOT cover (and why the implicit dispatch is
default-off, kernels/gram.py): inside a vmapped lax.while_loop the first
post-step gradient returns NaN for every batch member.

Run: python tools/pallas_check.py    (requires the TPU chip)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import waveome_tpu
    from waveome_tpu.kernels import full_kernel_build
    from waveome_tpu.kernels.gram import gram_xla
    from waveome_tpu.models import svgp
    from waveome_tpu.pallas_ops.gram_pallas import gram_fused, gram_pallas

    waveome_tpu.set_precision("float32")
    assert jax.default_backend() in ("tpu", "axon"), "needs the TPU chip"

    from bench import simulate

    X_np, Ys = simulate(n_outcomes=4)
    spec, _ = full_kernel_build(
        cat_vars=[0, 2], num_vars=[1], unit_idx=0,
        var_names=["id", "time", "female"], return_sum=True,
    )
    X = jnp.asarray(X_np, dtype=jnp.float32)
    raw0 = jnp.asarray(np.asarray(spec.init_raw_params(dtype=jnp.float32)))

    # 1. forward parity: single / vmap / nested vmap
    K_p = gram_pallas(spec, raw0, X, X)
    K_x = gram_xla(spec, raw0, X, X)
    err1 = float(jnp.max(jnp.abs(K_p - K_x)))
    B, T = 4, 6
    rawBT = raw0[None, None] + 0.02 * jax.random.normal(
        jax.random.PRNGKey(0), (B, T) + raw0.shape, dtype=jnp.float32)
    s_p = jax.jit(jax.vmap(jax.vmap(
        lambda r: jnp.sum(gram_pallas(spec, r, X, X)))))(rawBT)
    s_x = jax.jit(jax.vmap(jax.vmap(
        lambda r: jnp.sum(gram_xla(spec, r, X, X)))))(rawBT)
    err2 = float(jnp.max(jnp.abs(s_p - s_x) / jnp.abs(s_x)))
    print(f"forward: single max abs {err1:.2e}, nested-vmap rel {err2:.2e}")
    assert err1 < 1e-4 and err2 < 1e-5

    # 2. gradient parity through the custom VJP (vmapped loss)
    config = svgp.make_config(spec, "gaussian", num_data=X.shape[0],
                              input_dim=3, num_inducing_points=X.shape[0])
    p0 = svgp.init_params(config, X, key=jax.random.PRNGKey(0),
                          dtype=jnp.float32)
    YsB = jnp.asarray(Ys.T[:, :, None], dtype=jnp.float32)

    def loss_fused(kraw, y):
        K = gram_fused(spec, kraw, X, X)
        noise = config.likelihood.constrain(p0["lik_raw"])[0]
        L = jnp.linalg.cholesky(K + noise * jnp.eye(X.shape[0]))
        a = jax.scipy.linalg.cho_solve((L, True), y[:, 0])
        return 0.5 * jnp.sum(y[:, 0] * a) + jnp.sum(jnp.log(jnp.diag(L)))

    def loss_xla(kraw, y):
        K = gram_xla(spec, kraw, X, X)
        noise = config.likelihood.constrain(p0["lik_raw"])[0]
        L = jnp.linalg.cholesky(K + noise * jnp.eye(X.shape[0]))
        a = jax.scipy.linalg.cho_solve((L, True), y[:, 0])
        return 0.5 * jnp.sum(y[:, 0] * a) + jnp.sum(jnp.log(jnp.diag(L)))

    g_f = jax.jit(jax.vmap(jax.grad(loss_fused), in_axes=(None, 0)))(
        p0["kernel_raw"], YsB)
    g_x = jax.jit(jax.vmap(jax.grad(loss_xla), in_axes=(None, 0)))(
        p0["kernel_raw"], YsB)
    gerr = float(jnp.max(jnp.abs(g_f - g_x)))
    print(f"grad: vmapped max abs diff {gerr:.2e}")
    assert bool(jnp.all(jnp.isfinite(g_f))) and gerr < 1e-2
    print("pallas_check ok")


if __name__ == "__main__":
    main()
