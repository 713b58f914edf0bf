"""Bisect the custom_vjp/vmapped-while_loop NaN between the production
gram_fused kernel and the production plbfgs optimizer.

tools/pallas_nan_min.py (toy gram + custom_vjp + vmap + while_loop +
scatter) is HEALTHY on the chip; tools/pallas_nan_repro.py (full
production fit) reproduces. This script swaps production components into
the minimal harness one at a time:

    python tools/pallas_nan_bisect.py              # production gram_fused
                                                   #  in the toy while-loop
    PNB_TOY_GRAM=1    — toy custom_vjp gram, sanity (expect healthy)
    PNB_PLBFGS=1      — production gram_fused + production plbfgs
    PNB_PLBFGS_XLA=1  — XLA gram + production plbfgs (expect healthy)

Each mode prints per-member iteration counts and grad-NaN flags.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from waveome_tpu.kernels.spec import KernelSpec, Primitive
    from waveome_tpu.pallas_ops.gram_pallas import gram_fused
    from waveome_tpu.kernels.gram import gram_xla

    N = 500  # production size: pads to 512, grid (2, 2)
    sp = os.environ.get("PNB_SPEC", "se")
    if sp == "full":
        from waveome_tpu.kernels import full_kernel_build
        spec, _ = full_kernel_build(
            cat_vars=[0, 2], num_vars=[1], unit_idx=0,
            var_names=["id", "time", "female"], return_sum=True,
        )
    elif sp == "cat":
        spec = KernelSpec(components=((Primitive("categorical", 0),),))
    elif sp == "sum2":
        spec = KernelSpec(components=(
            (Primitive("squared_exponential", 0),),
            (Primitive("squared_exponential", 1),),
        ))
    elif sp == "prod":
        spec = KernelSpec(components=(
            (Primitive("categorical", 0),
             Primitive("squared_exponential", 1)),
        ))
    elif sp == "sum2d1":
        spec = KernelSpec(components=(
            (Primitive("squared_exponential", 0),),
            (Primitive("matern12", 0),),
        ))
    elif sp == "sed2":
        spec = KernelSpec(
            components=((Primitive("squared_exponential", 1),),))
    elif sp == "sum8":
        spec = KernelSpec(components=tuple(
            (Primitive("squared_exponential", 0),) for _ in range(8)))
    else:
        spec = KernelSpec(
            components=((Primitive("squared_exponential", 0),),))
    print("spec:", sp, "C =", len(spec.components))

    use_xla = bool(os.environ.get("PNB_PLBFGS_XLA"))

    def gram(raw, X):
        if use_xla:
            return gram_xla(spec, raw, X, X, None)
        return gram_fused(spec, raw, X, X, None)

    spec_p = spec.padded()
    C = len(spec_p.components)
    F = max(len(c) for c in spec_p.components)
    nparam = 3  # padded param slots per primitive
    nk = C * F * nparam

    def objective(flat, X, y):
        raw = flat[:-1].reshape(C, F, nparam)
        K = gram(raw, X)
        L = jnp.linalg.cholesky(K + 0.05 * jnp.eye(N, dtype=X.dtype))
        import jax.scipy.linalg as jsl
        alpha = jsl.solve_triangular(L, y - flat[-1], lower=True)
        return 0.5 * jnp.sum(alpha ** 2) + jnp.sum(jnp.log(jnp.diag(L)))

    B = 4
    key = jax.random.PRNGKey(0)
    D = max(max((p.dim for p in c), default=0)
            for c in spec_p.components) + 1
    if D > 1 and not os.environ.get("PNB_RANDX"):
        from bench import simulate
        Xnp, _ = simulate(n_outcomes=1)
        Xs = jnp.tile(jnp.asarray(Xnp[:N], jnp.float32)[None], (B, 1, 1))
    else:
        Xs = jax.random.normal(key, (B, N, D), dtype=jnp.float32)
    # PNB_PADD: zero-pad the feature axis to this many columns — tests
    # whether the failure is the skinny (N, D)/(D, N) block layout
    padd = int(os.environ.get("PNB_PADD", "0"))
    if padd > Xs.shape[-1]:
        Xs = jnp.concatenate(
            [Xs, jnp.zeros(Xs.shape[:-1] + (padd - Xs.shape[-1],),
                           Xs.dtype)], axis=-1)
    flat0 = jnp.tile(
        jnp.concatenate([jnp.full((nk,), 0.3, jnp.float32),
                         jnp.zeros((1,), jnp.float32)]), (B, 1))

    if os.environ.get("PNB_PLBFGS") or use_xla:
        from waveome_tpu.optimize.plbfgs import plbfgs_fit

        mask = np.ones(nk + 1, dtype=bool)

        def fit(flat, X, y):
            res = plbfgs_fit(
                lambda f: objective(f, X, y), flat, mask, max_iter=40)
            return res.num_iters, res.loss

        fa, xa = 0, 0
        flat_arg, xs_arg = flat0, Xs
        ys = jax.random.normal(jax.random.PRNGKey(1), (B, N),
                               dtype=jnp.float32)
        if os.environ.get("PNB_SHARED_X"):
            xa, xs_arg = None, Xs[0]
        if os.environ.get("PNB_SHARED_P0"):
            fa, flat_arg = None, flat0[0]
        its, losses = jax.jit(
            jax.vmap(fit, in_axes=(fa, xa, 0)))(flat_arg, xs_arg, ys)
        its = np.asarray(its)
        print(f"mode=plbfgs gram={'xla' if use_xla else 'pallas'} "
              f"iters={its.tolist()} losses={np.asarray(losses).tolist()}")
        if (its <= 2).all():
            print("BUG REPRODUCED: all fits stopped at iter <= 2")
        else:
            print("healthy")
        return

    # plbfgs ingredients, addable one at a time:
    #   PNB_TRIALS=1 — inner vmap over a 4-step trial grid (nested vmap
    #                  of the pallas forward)
    #   PNB_COND=1   — gradient evaluated under lax.cond
    add_trials = bool(os.environ.get("PNB_TRIALS"))
    add_cond = bool(os.environ.get("PNB_COND"))

    def fit(flat, X, y):
        grad_fn = jax.value_and_grad(objective)

        def body(carry):
            it, flat, _ = carry
            if add_trials:
                steps = jnp.asarray([2.0, 1.0, 0.4, 0.08], flat.dtype)
                fs = jax.vmap(
                    lambda t: objective(flat * (1.0 - 0.001 * t), X, y)
                )(steps)
                tsel = steps[jnp.argmin(fs)]
                flat = flat * (1.0 - 0.001 * tsel)
            if add_cond:
                loss, g = jax.lax.cond(
                    it >= 0,
                    lambda f: grad_fn(f, X, y),
                    lambda f: (jnp.zeros((), flat.dtype),
                               jnp.zeros_like(f)),
                    flat,
                )
            else:
                loss, g = grad_fn(flat, X, y)
            idx = it % flat.shape[0]
            newflat = flat.at[idx].set(flat[idx] - 0.01 * g[idx])
            bad = jnp.any(~jnp.isfinite(g))
            return it + 1, jnp.where(bad, flat, newflat), bad

        def cond(carry):
            it, _, bad = carry
            return (it < 8) & ~bad

        it, flat, bad = jax.lax.while_loop(
            cond, body, (jnp.array(0), flat, jnp.array(False)))
        return it, bad

    ys = jax.random.normal(jax.random.PRNGKey(1), (B, N), dtype=jnp.float32)
    i, bd = jax.jit(jax.vmap(fit, in_axes=(0, 0, 0)))(flat0, Xs, ys)
    its, bads = np.asarray(i), np.asarray(bd)
    print(f"mode=toyloop gram=gram_fused iters={its.tolist()} "
          f"nan_grad={bads.tolist()}")
    if bads.any():
        print("BUG REPRODUCED: NaN gradient inside the loop")
    else:
        print("healthy")


def main_svgp():
    """PNB_SVGP=1: vmap(penalized_fit) directly — the real collapsed
    exact-MLL objective + real plbfgs subset scatter, but NO segmented
    driver (no carry, static max_iter). Distinguishes objective-level
    from driver-level triggers."""
    import jax
    import jax.numpy as jnp

    from waveome_tpu.fit.penalized import penalized_fit
    from waveome_tpu.kernels import full_kernel_build
    from waveome_tpu.models import svgp
    from bench import simulate

    X, Ys = simulate(n_outcomes=4)
    spec, _ = full_kernel_build(
        cat_vars=[0, 2], num_vars=[1], unit_idx=0,
        var_names=["id", "time", "female"], return_sum=True,
    )
    config = svgp.make_config(spec, likelihood="gaussian",
                              num_inducing_points=X.shape[0],
                              num_data=X.shape[0], input_dim=X.shape[1])
    Xj = jnp.asarray(X, jnp.float32)

    def one(y):
        p0 = svgp.init_params(config, Xj)
        res = penalized_fit(config, p0, Xj, y, num_factor_iter=0,
                            max_iter=60, compute_importances=False)
        return res

    res = jax.jit(jax.vmap(one))(jnp.asarray(Ys, jnp.float32))
    import numpy as np
    iters = np.asarray(res.num_iters)
    print("num_iters:", iters.tolist())
    if (iters <= 2).all():
        print("BUG REPRODUCED: all fits stopped at iter <= 2")
    else:
        print("healthy")


if __name__ == "__main__":
    if os.environ.get("PNB_SVGP"):
        main_svgp()
    else:
        main()
