"""Benchmark: per-outcome GP fits/min on the reference's three headline
workloads, plus an analytic MFU estimate.

Reference baselines (BASELINE.md):
  - penalized Gaussian: 3 outcomes / 9.6 min via Ray on CPU
    (waveome_overview.ipynb cell 9) -> 0.3125 models/min
  - penalized NB (iHMP): 2 outcomes / ~32 min on an HPC node
    (ihmp_waveome.ipynb cell 11) -> 0.0625 models/min
  - kernel search: one candidate fit (kernel_test) = 2.55 min CPU
    (kernel_learning/simulation_test.py:219) -> 0.392 candidate fits/min
    — the BASELINE.json north-star metric ("per-outcome GP fits/min on
    kernel search", target 1000+/min)

Prints one JSON line per workload, then a combined summary line carrying
every number (the driver's single-line contract):
{"metric", "value", "unit", "vs_baseline", ...extras}.

Env: BENCH_WORKLOAD=gaussian|nb|search|all (default all),
BENCH_OUTCOMES, BENCH_MAX_ITER, BENCH_SEARCH_OUTCOMES,
BENCH_SEARCH_DEPTH, BENCH_SEARCH_RESTARTS.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_MODELS_PER_MIN = 3 / 9.6  # waveome_overview.ipynb cell-9 output
BASELINE_NB_PER_MIN = 2 / 32.0     # ihmp_waveome.ipynb cell 11
BASELINE_SEARCH_PER_MIN = 1 / 2.55  # simulation_test.py:219 comment

# TPU v5e (one chip): 197 TFLOP/s bf16 peak; f32 matmul rides the MXU at
# roughly half that. We report MFU against the bf16 peak (conservative).
PEAK_FLOPS = 197e12


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


def _emit(out):
    print(json.dumps(out))
    sys.stdout.flush()
    return out


def _probe_backend(timeout_s=240):
    """One bounded probe: does the TPU answer a trivial program?

    Probed from a SUBPROCESS (a failed backend init is cached for the
    life of a process; the tunneled axon handshake itself can take
    ~3 min, hence the generous single-probe timeout)."""
    import subprocess

    probe = ("import jax, jax.numpy as jnp; "
             "L = jnp.linalg.cholesky(jnp.eye(8)*2.0); "
             "print('TPU_OK', float(L[0,0]))")
    try:
        r = subprocess.run([sys.executable, "-c", probe],
                           capture_output=True, text=True,
                           timeout=timeout_s)
        return "TPU_OK" in (r.stdout or "")
    except subprocess.TimeoutExpired:
        return False


def _last_good():
    """Most recent committed BENCH_r*.json record with a non-null value.

    Rides along on the degraded-backend fallback line so a round whose
    TPU worker is down still carries the last measured numbers
    (VERDICT r3 'make the bench un-voidable')."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    best = None
    for p in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            with open(p) as f:
                rec = json.load(f)
        except Exception:  # noqa: BLE001 — unreadable record, skip
            continue
        parsed = rec.get("parsed")
        if parsed and parsed.get("value") is not None:
            best = {"from": os.path.basename(p), **parsed}
    return best


def _wait_for_backend(emit_fallback=False):
    """Block until the TPU backend answers a trivial program.

    The tunneled axon worker restarts take minutes after a crash.
    Bounded by BENCH_TPU_WAIT_S (default 30 min); returns False on
    give-up so the caller can emit a diagnostic record instead of
    stack-tracing. With ``emit_fallback`` a parseable JSON line (value
    null + last-known-good rider) goes out after the FIRST failed probe
    — within ~4 min of start — so a driver-side timeout kill can no
    longer void the round's bench record (BENCH_r03 was rc=124 with
    parsed=null because the old code slept silently for 30 min)."""
    max_wait = int(os.environ.get("BENCH_TPU_WAIT_S", "1800"))
    t0 = time.time()
    first = True
    while True:
        if _probe_backend():
            return True
        if first:
            print("# TPU backend unavailable; waiting for the worker",
                  file=sys.stderr)
            if emit_fallback:
                _emit({"metric": "penalized_gp_fits_per_min",
                       "value": None, "unit": "models/min",
                       "vs_baseline": None,
                       "error": "tpu backend unavailable; retrying",
                       "last_good": _last_good()})
            first = False
        if time.time() - t0 > max_wait:
            print(f"# backend still unavailable after {max_wait}s",
                  file=sys.stderr)
            return False
        time.sleep(30)


def main_gaussian():
    """Penalized Gaussian tutorial workload (N=500, M=N, saturated
    kernel, horseshoe, L-BFGS, pruning + importances)."""
    import jax

    from waveome_tpu.fit import fit_outcomes_penalized
    from waveome_tpu.kernels import full_kernel_build

    n_outcomes = int(os.environ.get("BENCH_OUTCOMES", "256"))
    max_iter = int(os.environ.get("BENCH_MAX_ITER", "200"))
    X, Ys = simulate(n_outcomes=n_outcomes)

    spec, _ = full_kernel_build(
        cat_vars=[0, 2], num_vars=[1], unit_idx=0,
        var_names=["id", "time", "female"], return_sum=True,
    )
    # split the first-call tax into its parts: backend handshake
    # (the tunneled axon init alone has taken ~3 min after worker
    # restarts), then compile-or-deserialize + run
    t0 = time.time()
    jax.block_until_ready(jax.numpy.zeros(()) + 1.0)
    handshake_s = time.time() - t0

    kwargs = dict(
        spec=spec,
        likelihood="gaussian",
        num_inducing_points=X.shape[0],  # all data, reference BaseGP default
        num_factor_iter=0,
        max_iter=max_iter,
        use_mesh=len(jax.devices()) > 1,
        device_chunk=int(os.environ.get("BENCH_DEVICE_CHUNK", "8")),
    )

    t0 = time.time()
    res = fit_outcomes_penalized(X, Ys, **kwargs)
    jax.block_until_ready(res.results.loss)
    compile_and_run = time.time() - t0

    t0 = time.time()
    res = fit_outcomes_penalized(X, Ys, seed=1, **kwargs)
    jax.block_until_ready(res.results.loss)
    elapsed = time.time() - t0

    finite = np.isfinite(np.asarray(res.results.loss))
    assert finite.mean() > 0.95, f"too many failed fits: {finite.mean()}"
    fits_per_min = n_outcomes / (elapsed / 60.0)

    # Analytic MFU for the dominant stage: each L-BFGS iteration of the
    # exact-Gaussian path evaluates the objective at 4 line-search trials
    # + 1 gradient pass (reverse-mode ~2 forward-equivalents); each
    # objective eval factorizes the NxN gram (N^3/3 fused-multiply-adds =
    # 2/3 N^3 flops) plus gram construction and solves (~2 N^2 ops,
    # negligible). Lower bound — ignores pruning/importances/optimal-q.
    N = X.shape[0]
    iters = float(np.asarray(res.results.num_iters, dtype=np.float64).mean())
    evals_per_iter = 4 + 2
    flops = n_outcomes * iters * evals_per_iter * (2.0 / 3.0) * N ** 3
    mfu = flops / elapsed / PEAK_FLOPS

    print(
        f"# gaussian n_outcomes={n_outcomes} N={N} max_iter={max_iter} "
        f"elapsed={elapsed:.1f}s first_call={compile_and_run:.1f}s "
        f"finite_frac={finite.mean():.3f} mean_iters={iters:.1f} "
        f"devices={len(jax.devices())}",
        file=sys.stderr,
    )
    return _emit({
        "metric": "penalized_gp_fits_per_min",
        "value": round(fits_per_min, 2),
        "unit": "models/min",
        "vs_baseline": round(fits_per_min / BASELINE_MODELS_PER_MIN, 1),
        "mfu_pct": round(100 * mfu, 2),
        "first_call_s": round(compile_and_run, 1),
        "handshake_s": round(handshake_s, 1),
        "mean_iters": round(iters, 1),
    })


def main_nb():
    """NB workload: the iHMP application shape (count outcomes, 9
    covariates, M=100 inducing, Adam+NatGrad to convergence)."""
    import jax

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "examples"))
    from ihmp_style import simulate_ihmp

    from waveome_tpu import GPSearch
    from waveome_tpu.fit import fit_outcomes_penalized
    from waveome_tpu.kernels import full_kernel_build

    n_outcomes = int(os.environ.get("BENCH_OUTCOMES", "128"))
    max_iter = int(os.environ.get("BENCH_MAX_ITER", "2000"))
    Xdf, Ydf = simulate_ihmp(n_outcomes=n_outcomes)

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
    print(f"# nb n_outcomes={n_outcomes} N={X_np.shape[0]} "
          f"max_iter={max_iter} elapsed={elapsed:.1f}s "
          f"finite_frac={finite.mean():.3f}", file=sys.stderr)
    return _emit({
        "metric": "penalized_nb_fits_per_min",
        "value": round(fits_per_min, 2),
        "unit": "models/min",
        "vs_baseline": round(fits_per_min / BASELINE_NB_PER_MIN, 1),
    })


def main_search():
    """Greedy kernel-structure search (the BASELINE.json north-star):
    lockstep multi_outcome_kernel_search over a batch of outcomes,
    counting candidate fits (= the reference's kernel_test calls, one of
    which took 2.55 min on CPU)."""
    import jax

    from waveome_tpu.search import engine
    from waveome_tpu.search.greedy import multi_outcome_kernel_search

    # 16 outcomes ≈ the production shape (the iHMP sweep searches
    # 32-outcome chunks): depth-1/2 expansions land at widths 128/256,
    # where fixed dispatch overheads amortize — at 4 outcomes (rounds
    # 1-3) the 32/64-wide dispatches were overhead-bound and understated
    # the machine's search throughput by ~2x
    n_outcomes = int(os.environ.get("BENCH_SEARCH_OUTCOMES", "16"))
    max_depth = int(os.environ.get("BENCH_SEARCH_DEPTH", "2"))
    num_restart = int(os.environ.get("BENCH_SEARCH_RESTARTS", "1"))
    X, Ys = simulate(n_outcomes=max(n_outcomes, 8))

    search_kwargs = dict(
        kern_list=["squared_exponential", "matern12", "linear", "periodic"],
        cat_vars=[0, 2],
        max_depth=max_depth,
        num_restart=num_restart,
        num_inducing_points=X.shape[0],
        random_seed=0,
    )

    # warm-up on the SAME outcome slice: identical candidate widths mean
    # the timed run reuses every compiled program (steady-state number)
    multi_outcome_kernel_search(X, Ys[:, :n_outcomes], **search_kwargs)

    engine.FIT_COUNT = 0
    t0 = time.time()
    results = multi_outcome_kernel_search(X, Ys[:, :n_outcomes],
                                          **search_kwargs)
    elapsed = time.time() - t0
    n_fits = engine.FIT_COUNT

    ok = sum(1 for r in results.values() if r["best_model"] is not None)
    assert ok >= 0.95 * n_outcomes, f"searches failed: {ok}/{n_outcomes}"
    fits_per_min = n_fits / (elapsed / 60.0)
    outcomes_per_min = n_outcomes / (elapsed / 60.0)
    print(f"# search n_outcomes={n_outcomes} candidate_fits={n_fits} "
          f"depth={max_depth} restarts={num_restart} elapsed={elapsed:.1f}s",
          file=sys.stderr)
    out = _emit({
        "metric": "kernel_search_fits_per_min",
        "value": round(fits_per_min, 2),
        "unit": "candidate fits/min",
        "vs_baseline": round(fits_per_min / BASELINE_SEARCH_PER_MIN, 1),
        "outcomes_searched_per_min": round(outcomes_per_min, 2),
        "candidate_fits": n_fits,
    })

    # warm-started variant (run_search(warm_start=True)): expansion/prune
    # candidates start from their parent's optimum — same candidate
    # count, fewer optimizer iterations per fit. Same compiled programs
    # (the randomize flag is traced), so no extra warm-up run needed.
    engine.FIT_COUNT = 0
    t0 = time.time()
    warm_results = multi_outcome_kernel_search(
        X, Ys[:, :n_outcomes], warm_start=True, **search_kwargs)
    warm_elapsed = time.time() - t0
    warm_fits = engine.FIT_COUNT
    ok = sum(1 for r in warm_results.values()
             if r["best_model"] is not None)
    assert ok >= 0.95 * n_outcomes, f"warm searches failed: {ok}"
    warm_fpm = warm_fits / (warm_elapsed / 60.0)
    print(f"# search-warm candidate_fits={warm_fits} "
          f"elapsed={warm_elapsed:.1f}s", file=sys.stderr)
    _emit({
        "metric": "kernel_search_warm_fits_per_min",
        "value": round(warm_fpm, 2),
        "unit": "candidate fits/min",
        "vs_baseline": round(warm_fpm / BASELINE_SEARCH_PER_MIN, 1),
        "outcomes_searched_per_min": round(
            n_outcomes / (warm_elapsed / 60.0), 2),
        "candidate_fits": warm_fits,
    })
    return out


def main_largen():
    """Large-N exact-Gaussian path: the auto-on CG/SLQ matmul-only
    objective (fit/batch.py objective='auto' switches above N=2000) vs
    forced dense Cholesky, measured on-chip. Not part of the default
    driver run (minutes per config); run with BENCH_WORKLOAD=largen."""
    import jax

    from waveome_tpu.fit import fit_outcomes_penalized
    from waveome_tpu.kernels import full_kernel_build

    N_big = int(os.environ.get("BENCH_LARGEN", "4096"))
    B = int(os.environ.get("BENCH_LARGEN_OUTCOMES", "32"))
    max_iter = int(os.environ.get("BENCH_MAX_ITER", "120"))
    n_units = N_big // 8
    X, Ys = simulate(n_units=n_units, n_per=8, n_outcomes=B)

    spec, _ = full_kernel_build(
        cat_vars=[0, 2], num_vars=[1], unit_idx=0,
        var_names=["id", "time", "female"], return_sum=True,
    )
    only = os.environ.get("BENCH_LARGEN_OBJ")  # run a single arm
    out = {}
    for objective in ((only,) if only else ("iterative", "cholesky")):
        kwargs = dict(
            spec=spec, likelihood="gaussian",
            num_inducing_points=X.shape[0], num_factor_iter=0,
            max_iter=max_iter, use_mesh=False, objective=objective,
            compute_importances=False,
        )
        res = fit_outcomes_penalized(X, Ys, **kwargs)  # compile+run
        jax.block_until_ready(res.results.loss)
        t0 = time.time()
        res = fit_outcomes_penalized(X, Ys, seed=1, **kwargs)
        jax.block_until_ready(res.results.loss)
        elapsed = time.time() - t0
        losses = np.asarray(res.results.loss)
        out[objective] = {
            "fits_per_min": round(B / (elapsed / 60.0), 2),
            "elapsed_s": round(elapsed, 1),
            "finite_frac": round(float(np.isfinite(losses).mean()), 3),
            "mean_loss": round(float(np.nanmean(losses)), 2),
        }
        print(f"# largen N={X.shape[0]} B={B} objective={objective} "
              f"elapsed={elapsed:.1f}s", file=sys.stderr)
    rec = {
        "metric": "largen_iterative_fits_per_min",
        "value": out.get("iterative", out.get("cholesky"))["fits_per_min"],
        "unit": "models/min",
        "N": X.shape[0],
        **{k: v for k, v in out.items()},
    }
    if "iterative" in out and "cholesky" in out:
        rec["vs_baseline"] = round(
            out["iterative"]["fits_per_min"]
            / max(out["cholesky"]["fits_per_min"], 1e-9), 2)
    else:
        rec["vs_baseline"] = 1.0
    return _emit(rec)


def main():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # 0.2 (not the 1.0 default-ish): through the axon tunnel EVERY
    # compile — even jit(convert_element_type) — costs ~0.4-0.5 s of
    # round trip, and a first fit_outcomes_penalized call triggers ~106
    # unique tiny-op compiles ≈ 48 s of its ~92 s wall (measured via
    # jax_log_compiles, round 4). Below 1.0 s they were never cached;
    # at 0.2 they are, so later processes cache-hit them. On CPU these
    # ops compile in ~10 ms and still skip the cache.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

    import waveome_tpu
    from waveome_tpu.runtime import install_cache_write_lock

    install_cache_write_lock(cache_dir)

    waveome_tpu.set_precision("float32")

    # don't touch jax.devices()/default_backend() before the probe — a
    # failed backend init is cached for the process
    want_tpu = "cpu" not in os.environ.get("JAX_PLATFORMS", "axon").lower()
    if want_tpu and not _wait_for_backend(emit_fallback=True):
        return _emit({"metric": "penalized_gp_fits_per_min",
                      "value": None, "unit": "models/min",
                      "vs_baseline": None,
                      "error": "tpu backend unavailable",
                      "last_good": _last_good()})

    which = os.environ.get("BENCH_WORKLOAD", "all")
    if which == "gaussian":
        return main_gaussian()
    if which == "nb":
        return main_nb()
    if which == "search":
        return main_search()
    if which == "largen":
        return main_largen()

    try:
        g = main_gaussian()
    except Exception as e:  # noqa: BLE001 — a mid-stage worker crash must
        # not void the whole bench record; wait the worker out and retry
        # the headline stage once
        print(f"# gaussian bench failed: {e}", file=sys.stderr)
        g = None
        if want_tpu and _wait_for_backend():
            try:
                g = main_gaussian()
            except Exception as e2:  # noqa: BLE001
                print(f"# gaussian bench retry failed: {e2}",
                      file=sys.stderr)
        if g is None:
            g = {"value": None, "vs_baseline": None, "mfu_pct": None,
                 "first_call_s": None}
    try:
        nb = main_nb()
    except Exception as e:  # noqa: BLE001 — same worker-crash guard as
        # the search stage below
        print(f"# nb bench failed: {e}", file=sys.stderr)
        nb = {"value": None, "vs_baseline": None}
    try:
        se = main_search()
    except Exception as e:  # noqa: BLE001 — a search-path failure (the
        # axon worker has crashed under very long compiles) must not void
        # the whole bench record
        print(f"# search bench failed: {e}", file=sys.stderr)
        se = {"value": None, "vs_baseline": None,
              "outcomes_searched_per_min": None}
    # combined summary line (last JSON line = the driver-parsed record):
    # headline remains the round-1/2 penalized metric for continuity,
    # with the north-star search number and NB number as named extras.
    rec = {
        "metric": "penalized_gp_fits_per_min",
        "value": g["value"],
        "unit": "models/min",
        "vs_baseline": g["vs_baseline"],
        "kernel_search_fits_per_min": se["value"],
        "kernel_search_vs_baseline": se["vs_baseline"],
        "outcomes_searched_per_min": se["outcomes_searched_per_min"],
        "penalized_nb_fits_per_min": nb["value"],
        "nb_vs_baseline": nb["vs_baseline"],
        "mfu_pct": g["mfu_pct"],
        "first_call_s": g["first_call_s"],
    }
    if g["value"] is None:
        rec["last_good"] = _last_good()
    _emit(rec)


if __name__ == "__main__":
    main()
