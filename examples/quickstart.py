"""Quickstart: the overview-tutorial workflow end to end.

Mirrors waveome_overview.ipynb: simulate 3 outcomes with known structure
(sin(t), sex×cos(t), linear trend + random intercept), run the penalized
optimization, inspect names/importances, and save figures.

Run:  python examples/quickstart.py  [--outdir /tmp/waveome_quickstart]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os

import numpy as np
import pandas as pd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/waveome_quickstart")
    ap.add_argument("--n-units", type=int, default=25)
    ap.add_argument("--n-per", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    from waveome_tpu import GPSearch

    rng = np.random.default_rng(0)
    n_units, n_per = args.n_units, args.n_per
    n = n_units * n_per
    ids = np.repeat([f"subj_{i}" for i in range(n_units)], n_per)
    t = np.tile(np.linspace(0, 10, n_per), n_units)
    sex = np.repeat((np.arange(n_units) % 2).astype(float), n_per)

    X = pd.DataFrame({"id": ids, "time": t, "sex": sex})
    Y = pd.DataFrame({
        "y_sin": np.sin(t) + 0.3 * rng.normal(size=n),
        "y_sex": sex * np.cos(t) + 0.3 * rng.normal(size=n),
        "y_trend": 0.3 * t
        + rng.normal(size=n_units)[np.repeat(np.arange(n_units), n_per)]
        + 0.3 * rng.normal(size=n),
    })

    gps = GPSearch(X=X, Y=Y, unit_col="id", categorical_vars=["sex"],
                   outcome_likelihood="gaussian",
                   Y_transform="standardize")
    gps.penalized_optimization(penalization_factor=None)

    for name, model in gps.models.items():
        print(f"{name}: kernel = {model.kernel_name}")
        print(f"  importances = {model.component_importance_dict}")

    g = gps.plot_heatmap()
    fig = getattr(g, "figure", None) or g[0]
    fig.savefig(os.path.join(args.outdir, "heatmap.png"), dpi=120)
    fig, _ = gps.plot_parts("y_sex", x_axis_label="time")
    fig.savefig(os.path.join(args.outdir, "parts_y_sex.png"), dpi=120)
    fig, _ = gps.plot_marginal("y_sin", "time")
    fig.savefig(os.path.join(args.outdir, "marginal_y_sin.png"), dpi=120)
    print(f"figures written to {args.outdir}")


if __name__ == "__main__":
    main()
