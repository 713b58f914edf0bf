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
# iHMP notebook cell 11: ~32 min for 2 NB outcomes on an HPC node
BASELINE_NB_PER_MIN = 2 / 32.0


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

    # BENCH_WORKLOAD=nb benchmarks the negative-binomial (iHMP-shaped)
    # pipeline instead of the Gaussian tutorial workload
    if os.environ.get("BENCH_WORKLOAD", "gaussian") == "nb":
        return main_nb()

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


def main_nb():
    """NB workload: the iHMP application shape (count outcomes, 9
    covariates, M=100 inducing, Adam+NatGrad to convergence)."""
    import jax

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "examples"))
    from ihmp_style import simulate_ihmp

    from waveome_tpu.fit import fit_outcomes_penalized
    from waveome_tpu.kernels import full_kernel_build

    n_outcomes = int(os.environ.get("BENCH_OUTCOMES", "128"))
    max_iter = int(os.environ.get("BENCH_MAX_ITER", "2000"))
    Xdf, Ydf = simulate_ihmp(n_outcomes=n_outcomes)
    from waveome_tpu import GPSearch

    gps = GPSearch(X=Xdf, Y=Ydf, unit_col="id",
                   categorical_vars=["diagnosis", "race", "site"],
                   outcome_likelihood="negativebinomial")
    spec, _ = full_kernel_build(
        cat_vars=gps.cat_idx, num_vars=gps.cont_idx,
        unit_idx=gps.unit_idx, var_names=gps.feat_names, return_sum=True,
    )
    kwargs = dict(
        spec=spec, likelihood="negative_binomial",
        num_inducing_points=100, penalization_factor=1.0,
        num_factor_iter=0, max_iter=max_iter, use_mesh=False,
        compute_importances=False,
    )
    X_np, Ys_np = gps.X.to_numpy(), gps.Y.to_numpy()
    res = fit_outcomes_penalized(X_np, Ys_np, **kwargs)  # compile+run
    jax.block_until_ready(res.results.loss)
    t0 = time.time()
    res = fit_outcomes_penalized(X_np, Ys_np, seed=1, **kwargs)
    jax.block_until_ready(res.results.loss)
    elapsed = time.time() - t0
    finite = np.isfinite(np.asarray(res.results.loss))
    assert finite.mean() > 0.95, f"too many failed fits: {finite.mean()}"
    fits_per_min = n_outcomes / (elapsed / 60.0)
    print(json.dumps({
        "metric": "penalized_nb_fits_per_min",
        "value": round(fits_per_min, 2),
        "unit": "models/min",
        "vs_baseline": round(fits_per_min / BASELINE_NB_PER_MIN, 1),
    }))
    print(f"# nb n_outcomes={n_outcomes} N={X_np.shape[0]} "
          f"max_iter={max_iter} elapsed={elapsed:.1f}s "
          f"finite_frac={finite.mean():.3f}", file=sys.stderr)


if __name__ == "__main__":
    main()
