"""REAL Hawaii Ocean Time-series (HOT) microbiome application.

The reference ships the HOT dataset (/root/reference/examples/HOT/:
metadata.csv = 42 samples x 39 station-ALOHA environmental covariates,
microbiome.csv = the same samples x 7,189 taxon read-count columns) but
no notebook for it in this image, so the analysis design below follows
the shipped data and the reference's other count applications
(iHMP/Breastmilk pattern: NB likelihood, unit + time + environment
covariates, penalized optimization, importance heatmap):

  - two depths (25 m photic / 500 m aphotic), each sampled ~21 times
    over 782 days -> ``unit_col='depth'`` (two longitudinal series);
  - covariates: Time (days), temperature, salinity, dissolved_oxygen,
    silicate — the environmental columns with no missing values —
    plus the sampling-chemistry batch label as a categorical;
  - outcomes: taxa observed (count > 0) in >= HOT_MIN_NONZERO of the
    42 samples (default 20 -> 4,516 taxa), missing counts as 0;
  - ``GPSearch(..., outcome_likelihood='negativebinomial')`` ->
    ``penalized_optimization`` through the checkpointed chunked sweep
    (fit/sweep.py) on the TPU chip, exactly like examples/ihmp_real.py.

The headline: every retained taxon (thousands) fits in one run on one
chip — the reference's Ray pool fits each taxon's model in its own
worker process at ~minutes per model.

Env knobs: HOT_OUTCOMES (default: all selected taxa), HOT_MIN_NONZERO
(default 20), HOT_MAX_ITER (default 2000), HOT_CKPT (checkpoint dir).
"""

import json
import os
import sys
import time

import numpy as np
import pandas as pd

REF_DATA = "/root/reference/examples/HOT"
HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
OUT_DIR = os.path.join(HERE, "output", "hot_real")

COVARIATES = ["depth", "Time", "chemistry", "temperature", "salinity",
              "dissolved_oxygen", "silicate"]
CATEGORICAL = ["chemistry"]


def load_hot(data_dir=REF_DATA, min_nonzero=20):
    """(X, Y): covariate frame and filtered taxon count frame."""
    mtd = pd.read_csv(os.path.join(data_dir, "metadata.csv"))
    bio = pd.read_csv(os.path.join(data_dir, "microbiome.csv"))
    df = mtd.rename(columns={"depth_(m)": "depth"}).merge(
        bio.drop(columns=["Sample_Name"]), on="Sample_Id", how="inner")

    taxa = [c for c in bio.columns if c not in ("Sample_Id",
                                                "Sample_Name")]
    counts = df[taxa].apply(pd.to_numeric, errors="coerce").fillna(0.0)
    keep = [c for c in taxa if (counts[c] > 0).sum() >= min_nonzero]

    X = df[COVARIATES].copy()
    X["Time"] = X["Time"].astype(float)
    Y = counts[keep].astype(float)
    return X, Y


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(HERE), ".jax_cache"),
    )
    # 0.2: tunnel compiles cost ~0.4-0.5 s each, even for tiny ops;
    # caching them saves ~48 s of first-call tax (bench.py:422)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

    from waveome_tpu import GPSearch

    os.makedirs(OUT_DIR, exist_ok=True)
    X, Y = load_hot(min_nonzero=int(os.environ.get("HOT_MIN_NONZERO",
                                                   "20")))
    n_out = int(os.environ.get("HOT_OUTCOMES", Y.shape[1]))
    Y = Y.iloc[:, :n_out]
    print(f"HOT: {X.shape[0]} samples, {X.shape[1]} covariates, "
          f"{Y.shape[1]} taxa, depths {sorted(X['depth'].unique())}")

    gps = GPSearch(
        X=X,
        Y=Y,
        unit_col="depth",
        categorical_vars=CATEGORICAL,
        outcome_likelihood="negativebinomial",
    )

    t0 = time.time()
    gps.penalized_optimization(
        kernel_options={
            "second_order_numeric": False,
            "unit_numeric_interactions": True,   # depth x time / env
            "categorical_numeric_interactions": False,
            "kerns": ["squared_exponential", "linear"],
        },
        penalization_factor=None,
        num_factor_iter=0,
        random_seed=9102,
        sparse_options={"num_inducing_points": X.shape[0]},  # N=42
        optimization_options={
            "num_opt_iter": int(os.environ.get("HOT_MAX_ITER", "2000")),
        },
        sweep_options={
            "checkpoint_dir": os.environ.get(
                "HOT_CKPT", os.path.join(OUT_DIR, "ckpt")),
            "chunk_size": 256,
        },
        importance_type="log_bf",
        verbose=True,
    )
    wall_min = (time.time() - t0) / 60.0

    losses = np.array([m.loss for m in gps.models.values()])
    finite = np.isfinite(losses)
    fits_per_min = len(gps.models) / max(wall_min, 1e-9)
    print(f"fitted {len(gps.models)} taxa in {wall_min:.1f} min "
          f"({fits_per_min:.1f} fits/min), "
          f"finite_frac={finite.mean():.3f}")

    frame = gps.importance_frame()
    frame.to_csv(os.path.join(OUT_DIR, "importances.csv"))

    # top taxa per covariate (the iHMP hbi_compounds pattern)
    tables = {}
    for feat in ["depth", "Time", "temperature", "dissolved_oxygen",
                 "silicate", "salinity"]:
        cols = [c for c in frame.columns if f"[{feat}]" in c]
        if not cols:
            continue
        score = frame[cols].sum(axis=1)
        top = score.sort_values(ascending=False).head(15)
        tables[feat] = [{"taxon": t, "metric": round(float(v), 3)}
                       for t, v in top.items() if v > 0]

    active_counts = {}
    for feat in gps.feat_names:
        cols = [c for c in frame.columns if f"[{feat}]" in c]
        if cols:
            active_counts[feat] = int((frame[cols].sum(axis=1) > 0).sum())

    summary = {
        "n_samples": int(X.shape[0]),
        "n_taxa": len(gps.models),
        "wall_minutes": round(wall_min, 2),
        "fits_per_min": round(fits_per_min, 2),
        "finite_frac": round(float(finite.mean()), 4),
        "covariate_active_counts": active_counts,
        "top_drivers": tables,
        "config": {
            "likelihood": "negativebinomial",
            "min_nonzero": int(os.environ.get("HOT_MIN_NONZERO", "20")),
            "max_iter": int(os.environ.get("HOT_MAX_ITER", "2000")),
            "kernels": ["squared_exponential", "linear"],
        },
    }
    with open(os.path.join(OUT_DIR, "hot_real_results.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: summary[k] for k in
                      ("n_samples", "n_taxa", "wall_minutes",
                       "fits_per_min")}))

    try:
        import matplotlib
        matplotlib.use("Agg")

        # thousands of taxa: suppress per-cell annotations and keep only
        # strongly-driven taxa so the clustered map stays renderable
        fig = gps.plot_heatmap(var_cutoff=0.0, metric_cutoff=10.0,
                               show_vals=False, figsize=(28, 8))
        fig.savefig(os.path.join(OUT_DIR, "heatmap.png"), dpi=110,
                    bbox_inches="tight")
        print("saved heatmap.png")
    except Exception as e:
        print(f"heatmap failed: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
