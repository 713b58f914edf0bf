"""Benchmark: per-outcome penalized GP fits/min on the tutorial workload.

Reference baseline (BASELINE.md): the overview tutorial fits 3 outcomes in
9.6 minutes via one Ray process per outcome on CPU (~0.31 models/min) —
N=500 observations, 3 covariates (id, time, female), saturated kernel,
Gaussian likelihood, scipy L-BFGS. This benchmark runs the SAME per-model
workload shape (N=500, M=500 inducing = all data like the reference's
BaseGP default, 4-component saturated kernel, horseshoe penalization,
L-BFGS, pruning + feature importances) for a large outcome batch as one
vmapped XLA program on the TPU chip, and reports models/min.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_MODELS_PER_MIN = 3 / 9.6  # waveome_overview.ipynb cell-9 output


def simulate(n_units=50, n_per=10, n_outcomes=256, seed=0):
    rng = np.random.default_rng(seed)
    ids = np.repeat(np.arange(n_units), n_per).astype(np.float64)
    time_col = np.tile(np.linspace(-2, 2, n_per), n_units)
    female = np.repeat((np.arange(n_units) % 2).astype(np.float64), n_per)
    X = np.column_stack([ids, time_col, female])
    n = X.shape[0]
    Ys = np.empty((n, n_outcomes))
    for b in range(n_outcomes):
        kind = b % 4
        if kind == 0:
            f = np.sin(1.5 * time_col + rng.uniform(0, 3))
        elif kind == 1:
            f = female * np.cos(1.5 * time_col + rng.uniform(0, 3))
        elif kind == 2:
            f = 0.8 * time_col + rng.normal(size=n_units)[ids.astype(int)]
        else:
            f = rng.normal() * np.ones(n)
        Ys[:, b] = f + 0.3 * rng.normal(size=n)
    return X, Ys


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    import waveome_tpu
    from waveome_tpu.fit import fit_outcomes_penalized
    from waveome_tpu.kernels import full_kernel_build

    waveome_tpu.set_precision("float32")

    n_outcomes = int(os.environ.get("BENCH_OUTCOMES", "256"))
    max_iter = int(os.environ.get("BENCH_MAX_ITER", "200"))
    X, Ys = simulate(n_outcomes=n_outcomes)

    spec, _ = full_kernel_build(
        cat_vars=[0, 2], num_vars=[1], unit_idx=0,
        var_names=["id", "time", "female"], return_sum=True,
    )

    kwargs = dict(
        spec=spec,
        likelihood="gaussian",
        num_inducing_points=X.shape[0],  # all data, reference BaseGP default
        num_factor_iter=0,
        max_iter=max_iter,
        use_mesh=len(jax.devices()) > 1,
        device_chunk=int(os.environ.get("BENCH_DEVICE_CHUNK", "8")),
    )

    # warm-up / compile (same shapes)
    t0 = time.time()
    res = fit_outcomes_penalized(X, Ys, **kwargs)
    jax.block_until_ready(res.results.loss)
    compile_and_run = time.time() - t0

    # timed steady-state run
    t0 = time.time()
    res = fit_outcomes_penalized(X, Ys[:, : n_outcomes], seed=1, **kwargs)
    jax.block_until_ready(res.results.loss)
    elapsed = time.time() - t0

    finite = np.isfinite(np.asarray(res.results.loss))
    assert finite.mean() > 0.95, f"too many failed fits: {finite.mean()}"

    fits_per_min = n_outcomes / (elapsed / 60.0)
    out = {
        "metric": "penalized_gp_fits_per_min",
        "value": round(fits_per_min, 2),
        "unit": "models/min",
        "vs_baseline": round(fits_per_min / BASELINE_MODELS_PER_MIN, 1),
    }
    print(json.dumps(out))
    print(
        f"# n_outcomes={n_outcomes} N={X.shape[0]} max_iter={max_iter} "
        f"elapsed={elapsed:.1f}s first_call={compile_and_run:.1f}s "
        f"finite_frac={finite.mean():.3f} devices={len(jax.devices())}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
