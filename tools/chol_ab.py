"""A/B fit-quality harness for the lane-batched Pallas Cholesky.

The hybrid kernel (pallas_ops/chol_pallas.py cholesky_auto) factors
line-search trial grams with ~1e-4 relative error vs XLA. A throughput
win that comes with halved L-BFGS iteration counts is only real if the
fits still reach the same optima — this tool runs the bench Gaussian
workload in two child processes (WAVEOME_PALLAS_CHOL=0 / 1; the env is
read at trace time, so cached traces make in-process flipping unsound),
dumps per-outcome final losses + iteration counts, and prints the
comparison.

Usage:  python tools/chol_ab.py [--outcomes 256] [--max-iter 200]
Child:  python tools/chol_ab.py --child OUT.npz   (internal)
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_child(out_path, n_outcomes, max_iter):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import waveome_tpu
    from waveome_tpu.fit import fit_outcomes_penalized
    from waveome_tpu.kernels import full_kernel_build

    waveome_tpu.set_precision("float32")
    sys.path.insert(0, os.path.join(REPO))
    import bench

    X, Ys = bench.simulate(n_outcomes=n_outcomes)
    spec, _ = full_kernel_build(
        cat_vars=[0, 2], num_vars=[1], unit_idx=0,
        var_names=["id", "time", "female"], return_sum=True,
    )
    res = fit_outcomes_penalized(
        X, Ys, spec=spec, likelihood="gaussian",
        num_inducing_points=X.shape[0], num_factor_iter=0,
        max_iter=max_iter, use_mesh=False, seed=1,
    )
    jax.block_until_ready(res.results.loss)
    np.savez(out_path,
             loss=np.asarray(res.results.loss),
             num_iters=np.asarray(res.results.num_iters))
    print(f"child done: {out_path}", file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", default=None)
    ap.add_argument("--outcomes", type=int,
                    default=int(os.environ.get("BENCH_OUTCOMES", "256")))
    ap.add_argument("--max-iter", type=int,
                    default=int(os.environ.get("BENCH_MAX_ITER", "200")))
    ap.add_argument("--var", default="WAVEOME_PALLAS_CHOL",
                    help="env flag to A/B (0 vs 1), e.g. "
                         "WAVEOME_BLOCKED_CHOL for the blocked XLA form")
    args = ap.parse_args()

    if args.child:
        run_child(args.child, args.outcomes, args.max_iter)
        return

    tmp = tempfile.mkdtemp(prefix="chol_ab_")
    paths = {}
    for flag in ("0", "1"):
        out = os.path.join(tmp, f"chol{flag}.npz")
        env = dict(os.environ, **{args.var: flag})
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", out,
             "--outcomes", str(args.outcomes),
             "--max-iter", str(args.max_iter)],
            env=env, check=True, cwd=REPO)
        paths[flag] = out

    a = np.load(paths["0"])   # XLA native
    b = np.load(paths["1"])   # variant under test
    la, lb = a["loss"], b["loss"]
    fin = np.isfinite(la) & np.isfinite(lb)
    # loss is a penalized NLL (lower better); scale-relative comparison
    scale = np.maximum(np.abs(la[fin]), 1.0)
    d = (lb[fin] - la[fin]) / scale           # >0: hybrid worse
    rec = {
        "n": int(fin.sum()),
        "finite_xla": float(np.isfinite(la).mean()),
        "finite_pallas": float(np.isfinite(lb).mean()),
        "mean_iters_xla": float(a["num_iters"].mean()),
        "mean_iters_pallas": float(b["num_iters"].mean()),
        "mean_rel_loss_delta": float(d.mean()),
        "max_rel_loss_delta": float(d.max()),
        "frac_pallas_worse_1e3": float((d > 1e-3).mean()),
        "frac_pallas_worse_1e2": float((d > 1e-2).mean()),
    }
    print(json.dumps(rec, indent=2))


if __name__ == "__main__":
    main()
