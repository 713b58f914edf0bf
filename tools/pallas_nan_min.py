"""MINIMAL upstream repro for the custom_vjp-under-vmapped-while_loop NaN.

Context (ROADMAP #2): the production repro (tools/pallas_nan_repro.py)
shows every vmapped penalized L-BFGS fit stopping at iter 1 with a NaN
first post-step gradient when the gram is a Pallas call wrapped in
jax.custom_vjp — with BOTH the XLA-replay backward and the hand-derived
analytic backward, so the bug lives in the custom_vjp/forward
composition, not in either backward. This script strips everything
waveome-specific away: a one-op Pallas SE-gram kernel + custom_vjp, an
objective that sums the gram, a while_loop "optimizer" whose step does
the same gather/scatter (`flat.at[idx].set`) plbfgs does, all under
jax.vmap.

Ablation matrix (each flag removes one suspect):
    python tools/pallas_nan_min.py             # full composition
    PNM_NO_VMAP=1     — while_loop+custom_vjp, no batching rule
    PNM_NO_SCATTER=1  — no .at[].set inside the loop body
    PNM_NO_CVJP=1     — raw pallas_call forward (jvp-less): fwd-only
    PNM_XLA=1         — same composition, jnp gram instead of Pallas
    PNM_INTERPRET=1   — Pallas interpret mode (runs on CPU)

Healthy output: grad finite at every loop iteration for all batch
members. Bug signature: iteration>=1 grads all-NaN only in the full
composition. The production bug manifests on the TPU (axon backend).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    NO_VMAP = bool(os.environ.get("PNM_NO_VMAP"))
    NO_SCATTER = bool(os.environ.get("PNM_NO_SCATTER"))
    NO_CVJP = bool(os.environ.get("PNM_NO_CVJP"))
    XLA = bool(os.environ.get("PNM_XLA"))
    N = 128  # one (8,128)-aligned tile

    # x is (N, 1) — 2-D like the production gram inputs, so the
    # pallas_call vmap batching rule's (Squeezed(), N, 1) block mapping
    # lowers cleanly (a 1-D (N,) input batched to (B, N) produces a
    # (1, 128) block that FAILS the mosaic (8,128) tiling check — the
    # first concrete evidence the fragile component is the default
    # batching rule itself).
    def se_gram_ref(x, v, ls):
        d = x[:, 0][:, None] - x[:, 0][None, :]
        return v * jnp.exp(-0.5 * d * d / (ls * ls))

    def kernel(x_ref, p_ref, o_ref):
        x = x_ref[...][:, 0]
        v, ls = p_ref[0, 0], p_ref[0, 1]
        d = x[:, None] - x[None, :]
        o_ref[...] = v * jnp.exp(-0.5 * d * d / (ls * ls))

    def gram_pallas_raw(x, v, ls):
        p = jnp.stack([v, ls])[None, :]  # (1, 2): 2-D so the vmap
        # batching rule's (Squeezed(), 1, 2) block passes mosaic tiling
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, N), x.dtype),
            interpret=bool(os.environ.get("PNM_INTERPRET")),
        )(x, p)

    if XLA:
        gram = se_gram_ref
    elif NO_CVJP:
        gram = gram_pallas_raw
    else:
        @jax.custom_vjp
        def gram(x, v, ls):
            return gram_pallas_raw(x, v, ls)

        def fwd(x, v, ls):
            return gram(x, v, ls), (x, v, ls)

        def bwd(res, g):
            x2, v, ls = res
            x = x2[:, 0]
            d = x[:, None] - x[None, :]
            e = jnp.exp(-0.5 * d * d / (ls * ls))
            K = v * e
            gv = jnp.sum(g * e)
            gls = jnp.sum(g * K * d * d / (ls ** 3))
            gx = 2.0 * jnp.sum(g * K * (-d) / (ls * ls), axis=1)
            return gx[:, None], gv, gls

        gram.defvjp(fwd, bwd)

    def objective(flat, x):
        # flat = [raw_v, raw_ls, mean]; softplus like the real params
        v = jnp.logaddexp(flat[0], 0.0)
        ls = jnp.logaddexp(flat[1], 0.0)
        K = gram(x, v, ls)
        # a cholesky in the objective like the real ELBO
        L = jnp.linalg.cholesky(K + 0.05 * jnp.eye(N, dtype=x.dtype))
        alpha = jax.scipy.linalg.solve_triangular(
            L, x[:, 0] - flat[2], lower=True)
        return 0.5 * jnp.sum(alpha ** 2) + jnp.sum(jnp.log(jnp.diag(L)))

    def fit(flat0, x):
        grad_fn = jax.value_and_grad(objective)

        def body(carry):
            it, flat, _ = carry
            loss, g = grad_fn(flat, x)
            # the plbfgs-style gather/scatter: update one coordinate
            # through .at[].set with a traced index
            idx = it % flat.shape[0]
            if NO_SCATTER:
                newflat = flat - 0.1 * g
            else:
                newflat = flat.at[idx].set(flat[idx] - 0.1 * g[idx])
            bad = jnp.any(~jnp.isfinite(g))
            return it + 1, jnp.where(bad, flat, newflat), bad

        def cond(carry):
            it, _, bad = carry
            return (it < 8) & ~bad

        it, flat, bad = jax.lax.while_loop(
            cond, body, (jnp.array(0), flat0, jnp.array(False)))
        return it, flat, bad

    B = 4
    key = jax.random.PRNGKey(0)
    xs = jax.random.normal(key, (B, N, 1), dtype=jnp.float32)
    flats = jnp.tile(jnp.array([0.5, 0.3, 0.0], jnp.float32), (B, 1))

    mode = ("XLA" if XLA else "pallas") + (
        "+rawfwd" if NO_CVJP else "" if XLA else "+custom_vjp")
    if NO_VMAP:
        its, flats1, bads = [], [], []
        for b in range(B):
            i, f, bd = jax.jit(fit)(flats[b], xs[b])
            its.append(int(i)); bads.append(bool(bd))
        its = np.array(its); bads = np.array(bads)
    else:
        i, f, bd = jax.jit(jax.vmap(fit))(flats, xs)
        its = np.asarray(i); bads = np.asarray(bd)
    print(f"mode={mode} vmap={not NO_VMAP} scatter={not NO_SCATTER} "
          f"iters={its.tolist()} nan_grad={bads.tolist()}")
    if bads.any():
        print("BUG REPRODUCED: NaN gradient inside the loop")
    else:
        print("healthy: all iterations ran with finite grads")


if __name__ == "__main__":
    main()
