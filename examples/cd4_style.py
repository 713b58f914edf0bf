"""CD4-style bivariate multi-output workflow (LMC).

Mirrors the reference's CD4 application (examples/CD4/CD4.ipynb):
two correlated longitudinal count outcomes per subject — CD4 cell counts
and HIV RNA — modelled jointly with a Linear Model of Coregionalization
(`MultiOutputPSVGP`, model_classes.py:1129-1612): shared latent GPs over
(subject, time, treatment), horseshoe-penalized mixing weights, latent
pruning, latent-process and prediction plots.

Run:  python examples/cd4_style.py [--outdir /tmp/waveome_cd4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def simulate_cd4(n_subjects=30, n_visits=8, seed=0):
    """Bivariate trajectories driven by shared latents: a declining
    time trend (flipped sign between outcomes — CD4 falls as RNA rises),
    per-subject intercepts, and a treatment response."""
    rng = np.random.default_rng(seed)
    n = n_subjects * n_visits
    sid = np.repeat(np.arange(n_subjects), n_visits)
    t = np.tile(np.linspace(0, 36, n_visits), n_subjects)  # months
    treat = np.repeat((rng.random(n_subjects) < 0.5).astype(float),
                      n_visits)
    age = np.repeat(rng.uniform(20, 60, n_subjects), n_visits)

    subj = rng.normal(0, 0.5, n_subjects)[sid]
    trend = -0.04 * t
    response = treat * 0.05 * t  # treated subjects recover
    lat = trend + response + subj

    cd4 = 6.0 + lat + 0.15 * rng.normal(size=n)  # log CD4 count
    rna = 8.0 - 1.5 * lat + 0.3 * rng.normal(size=n)  # log10-ish RNA

    X = pd.DataFrame({
        "id": [f"s{i}" for i in sid],
        "months": t,
        "treated": treat,
        "age": age,
    })
    Y = pd.DataFrame({"log_cd4": cd4, "log_rna": rna})
    return X, Y


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/waveome_cd4")
    ap.add_argument("--rank", type=int, default=0,
                    help="LMC rank (0 = SVD estimate)")
    ap.add_argument("--max-iter", type=int, default=1500)
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    from waveome_tpu import GPSearch

    X, Y = simulate_cd4()
    gps = GPSearch(X=X, Y=Y, unit_col="id", categorical_vars=["treated"],
                   outcome_likelihood="gaussian",
                   Y_transform="standardize")

    t0 = time.time()
    kernel_options = {"ranks": args.rank} if args.rank else None
    res = gps.multioutput_penalized_optimization(
        kernel_options=kernel_options,
        num_opt_iter=args.max_iter,
    )
    print(f"LMC fit in {time.time() - t0:.0f}s")
    model = res["final_model"] if isinstance(res, dict) else res
    W = np.asarray(model.params["W"])
    print(f"{W.shape[1]} latents, mixing weights W =\n{W.round(2)}")
    print("final loss:", float(model.loss_history[-1]))

    fig = gps.plot_latent_processes(x_axis_label="months")
    fig = getattr(fig, "figure", None) or (
        fig[0] if isinstance(fig, tuple) else fig)
    fig.savefig(os.path.join(args.outdir, "cd4_latents.png"), dpi=120)
    fig = gps.plot_multioutput_predictions(x_axis_label="months")
    fig = getattr(fig, "figure", None) or (
        fig[0] if isinstance(fig, tuple) else fig)
    fig.savefig(os.path.join(args.outdir, "cd4_predictions.png"), dpi=120)
    print(f"figures written to {args.outdir}")


if __name__ == "__main__":
    main()
