"""Minimal repro driver for the Pallas-gram-in-vmapped-while_loop NaN.

Runs the REAL segmented plbfgs penalized fit (the exact failing
composition) on a small batch with the fused Pallas gram enabled, and
reports per-outcome num_iters + losses. Healthy: num_iters ~30-60,
finite losses matching the XLA-gram run. Bug signature (round 2):
num_iters == 1 for every outcome (first post-step gradient NaN).

Usage:  WAVEOME_PALLAS_GRAM=1 python tools/pallas_nan_repro.py
Compare: python tools/pallas_nan_repro.py   (XLA path)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    import numpy as np

    import importlib

    from waveome_tpu.fit import fit_outcomes_penalized
    from waveome_tpu.kernels import full_kernel_build

    # the kernels package re-exports the gram FUNCTION under the same
    # name, shadowing the submodule attribute — resolve the module itself
    G = importlib.import_module("waveome_tpu.kernels.gram")

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "."))
    from bench import simulate

    print(f"PALLAS_GRAM={G._PALLAS_GRAM} backend={jax.default_backend()}")
    X, Ys = simulate(n_outcomes=16)
    spec, _ = full_kernel_build(
        cat_vars=[0, 2], num_vars=[1], unit_idx=0,
        var_names=["id", "time", "female"], return_sum=True,
    )
    res = fit_outcomes_penalized(
        X, Ys, spec, likelihood="gaussian",
        num_inducing_points=X.shape[0], num_factor_iter=0, max_iter=60,
        use_mesh=False, compute_importances=False,
    )
    iters = np.asarray(res.results.num_iters)
    losses = np.asarray(res.results.loss)
    print("num_iters:", iters.tolist())
    print("losses finite:", np.isfinite(losses).mean(),
          "mean:", float(np.nanmean(losses)))
    if (iters <= 2).all():
        print("BUG REPRODUCED: all fits stopped at iter <= 2")
    else:
        print("healthy")


if __name__ == "__main__":
    main()
