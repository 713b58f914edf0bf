"""REAL Breastmilk infant-metabolome application (Poisson search).

Runs the reference's Breastmilk study
(/root/reference/examples/Breastmilk/data/) end-to-end through
``GPSearch.run_search`` with the Poisson likelihood — the workload of
the reference notebook
``examples/Breastmilk/breastmilk_infant_metabolites_Poisson.ipynb``:

  - ``infant_metabolite.tsv``: 71 stool samples x ~1150 metabolite
    intensity columns, first row = names (notebook cell 4);
  - ``stool_metadata.csv``: per-sample covariates, merged on the
    participant column ``X`` with how='right' (cell 4);
  - metabolite filter (cell 8): keep a metabolite when >= 5
    participants each have >= 2 nonzero observations (~1020 kept);
  - ``GPSearch(X=[X, Gestational_age, Birth_weight, Sex,
    Maternal_vs_donor, Age_at_stool_sample, Diet], unit_col='X',
    categorical_vars=[Sex, Maternal_vs_donor, Diet],
    outcome_likelihood='poisson')`` then ``run_search(random_seed=9102)``
    (cell 10); heatmap + per-unit marginal plots (cells 15-17).

The reference fans the per-metabolite searches out to Ray workers; here
every depth's candidate batch across ALL metabolites fits as one
vmapped lockstep program on the TPU (search/greedy.py,
search/engine.py), segmented into bounded device dispatches.

Env knobs: BM_OUTCOMES (default: all selected metabolites), BM_DEPTH
(default 3), BM_RESTARTS (default 1), BM_MAX_ITER (default 200).
"""

import json
import os
import sys
import time

import numpy as np
import pandas as pd

REF_DATA = "/root/reference/examples/Breastmilk/data"
HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
OUT_DIR = os.path.join(HERE, "output", "breastmilk_real")

# The notebook passes unit_col='X'; in the SHIPPED metadata 'X' is the
# sample id (unique per row, '1a' = participant 1 visit a) while
# External_ID is the participant. Grouping the notebook's >=5-units x
# >=2-nonzero filter by External_ID reproduces its reported count
# exactly (1020 metabolites selected), so External_ID is the unit here.
COVARIATES = ["External_ID", "Gestational_age", "Birth_weight", "Sex",
              "Maternal_vs_donor", "Age_at_stool_sample", "Diet"]
CATEGORICAL = ["Sex", "Maternal_vs_donor", "Diet"]


def load_breastmilk(data_dir=REF_DATA):
    """(X, Y): covariate frame and filtered metabolite intensity frame,
    reproducing notebook cells 4-8."""
    metabolite = pd.read_csv(
        os.path.join(data_dir, "infant_metabolite.tsv"), header=None,
        sep="\t")
    metabolite.columns = metabolite.iloc[0]
    metabolite = metabolite.drop([0]).reset_index(drop=True)

    metadata = pd.read_csv(
        os.path.join(data_dir, "stool_metadata.csv"), header=None,
        sep=",")
    metadata.columns = metadata.iloc[0]
    metadata = metadata.drop([0]).reset_index(drop=True)
    # the CSV ships with a UTF-8 BOM on the first header cell
    metadata.columns = [str(c).lstrip("﻿") for c in metadata.columns]

    df = metadata.merge(metabolite, on="X", how="right")

    numeric_cols = (
        ["External_ID", "Visit_time_point", "Gestational_age_week",
         "Gestational_age_day", "Gestational_age", "Birth_weight",
         "Age_at_breast_milk_sample", "Stool_sample_date",
         "Age_at_stool_sample"] + df.columns[13:].tolist()
    )
    df[numeric_cols] = df[numeric_cols].apply(pd.to_numeric,
                                              errors="coerce")

    # metabolite selection (cell 8): >=5 unit groups with >=2 nonzero
    selected = []
    for col in df.columns.tolist()[13:]:
        nonzero = df[(df[col] != 0) & (df[col].notna())]
        counts = nonzero.groupby("External_ID")[col].count()
        if (counts >= 2).sum() >= 5:
            selected.append(col)
    df = df.fillna(0)

    X = df[COVARIATES].copy()
    Y = df[selected].astype(float)
    return X, Y


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "")
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(HERE), ".jax_cache"),
    )
    from waveome_tpu import GPSearch

    os.makedirs(OUT_DIR, exist_ok=True)
    X, Y = load_breastmilk()
    n_out = int(os.environ.get("BM_OUTCOMES", Y.shape[1]))
    # keep the notebook's worked example (cells 13-15: 80% var explained
    # by categorical[4]*squared_exponential[5]) inside any subset so the
    # recovered structure can be compared against the reference's
    target = "N6-carboxymethyllysine"
    cols = list(Y.columns[:n_out])
    if target in Y.columns and target not in cols:
        cols = [target] + cols[: n_out - 1]
    Y = Y[cols]
    print(f"Breastmilk: {X.shape[0]} samples, {X.shape[1] - 1} "
          f"covariates + unit, {Y.shape[1]} metabolites, "
          f"{X['External_ID'].nunique()} infants")

    gps = GPSearch(
        X=X,
        Y=Y,
        unit_col="External_ID",
        categorical_vars=CATEGORICAL,
        outcome_likelihood="poisson",
    )
    t0 = time.time()
    gps.run_search(
        random_seed=9102,  # notebook cell 10
        max_depth=int(os.environ.get("BM_DEPTH", "3")),
        num_restart=int(os.environ.get("BM_RESTARTS", "1")),
        max_iter=int(os.environ.get("BM_MAX_ITER", "200")),
        verbose=True,
    )
    mins = (time.time() - t0) / 60.0

    out = {
        "mode": "search",
        "likelihood": "poisson",
        "n_samples": int(X.shape[0]),
        "n_metabolites": len(gps.models),
        "wall_minutes": round(mins, 2),
        "outcomes_per_min": round(len(gps.models) / max(mins, 1e-9), 2),
        "best_models": {o: m.kernel_name for o, m in gps.models.items()},
        "var_explained": {o: gps.search_info[o]["var_exp"]
                          for o in gps.models},
    }
    with open(os.path.join(OUT_DIR, "search_results.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: out[k] for k in
                      ("n_metabolites", "wall_minutes",
                       "outcomes_per_min")}))

    # notebook cells 15-17: per-unit marginal for the notebook's example
    # metabolite (when selected) + the variance-explained heatmap
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    target = "N6-carboxymethyllysine"
    if target in gps.models:
        for unit in (1, 5):
            try:
                fig, _ = gps.plot_marginal(
                    out_label=target,
                    x_axis_label="Age_at_stool_sample",
                    unit_label=unit,
                )
                fig.savefig(os.path.join(
                    OUT_DIR, f"marginal_unit{unit}.png"), dpi=120)
                plt.close("all")
            except Exception as e:  # plot parity is best-effort here
                print(f"marginal plot (unit={unit}) failed: {e}")
    try:
        g = gps.plot_heatmap(var_cutoff=0.8, figsize=(24, 8))
        g.savefig(os.path.join(OUT_DIR, "heatmap.png"), dpi=120)
        plt.close("all")
    except Exception as e:
        print(f"heatmap failed: {e}")
    print("artifacts in", OUT_DIR)


if __name__ == "__main__":
    main()
