"""Accuracy of the hybrid Pallas Cholesky on FIT-REALISTIC grams.

The microbench (tools/chol_bench.py) uses A·Aᵀ + N·I — condition ~N.
Real objective evaluations factor K_rbf + σ²I whose condition is
~N·var/σ²; the explicit-inverse panel solve amplifies rounding by
cond(L11). This tool measures, per σ², the logdet and max-entry error
of XLA f32 vs hybrid(refine=r) against a float64 numpy reference, plus
per-variant time. Run on the chip.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(B=64, N=500):
    import jax
    import jax.numpy as jnp

    from waveome_tpu.pallas_ops.chol_pallas import cholesky_hybrid

    rng = np.random.default_rng(0)
    x = rng.uniform(-2, 2, size=(N, 1))
    sq = (x - x.T) ** 2
    out = []
    for sigma2 in (1.0, 0.09, 0.01):
        Ks = []
        for b in range(B):
            ls = 0.3 + 2.0 * (b / B)
            Ks.append(np.exp(-0.5 * sq / ls ** 2) + sigma2 * np.eye(N))
        K64 = np.stack(Ks)
        L64 = np.linalg.cholesky(K64)
        logdet64 = 2 * np.sum(np.log(np.diagonal(L64, axis1=1, axis2=2)),
                              axis=1)
        K32 = jnp.asarray(K64.astype(np.float32))

        def report(name, fn):
            # block_until_ready does not sync on the axon tunnel; the
            # host fetch is the only reliable completion barrier, so the
            # time below is one fetched call (upper bound incl ~200 ms
            # dispatch overhead) — accuracy is the point of this tool.
            Lf = fn(K32)
            _ = float(Lf[0, 0, 0])
            t0 = time.time()
            Lt = fn(K32 + 1e-6)   # timing-only call (fresh input)
            _ = float(Lt[0, 0, 0])
            dt = time.time() - t0
            Lf = np.asarray(Lf, dtype=np.float64)
            ld = 2 * np.sum(np.log(np.maximum(
                np.diagonal(Lf, axis1=1, axis2=2), 1e-30)), axis=1)
            lderr = np.max(np.abs(ld - logdet64))
            maxerr = np.max(np.abs(Lf - L64)) / np.max(np.abs(L64))
            print(f"sigma2={sigma2:<5} {name:<12} "
                  f"logdet_err={lderr:10.4f} rel_L_err={maxerr:.2e} "
                  f"t={dt*1000:6.2f} ms", flush=True)

        report("xla", jax.jit(jnp.linalg.cholesky))
        for r in (0, 1, 2):
            report(f"hyb_ref{r}", jax.jit(
                lambda K, r=r: cholesky_hybrid(K, refine=r)))
    return out


if __name__ == "__main__":
    main(int(os.environ.get("B", "64")), int(os.environ.get("N", "500")))
