"""Kernel-recovery simulation study — the integration benchmark.

The TPU-native counterpart of the reference's evaluation harness
(kernel_learning/simulation_test.py + examples/simulations/
sim_waveome_hpc_run.py): simulate outcomes from the four ground-truth
longitudinal kernels, fit with (a) the penalized saturated-kernel path and
(b) the greedy kernel search, and score feature recovery, holdout MSE and
KL-to-truth.

Run:  python examples/simulation_study.py [--units 10] [--rate 8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--units", type=int, default=10)
    ap.add_argument("--rate", type=int, default=8)
    ap.add_argument("--noise", type=float, default=0.3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-iter", type=int, default=300)
    ap.add_argument("--skip-search", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp

    from waveome_tpu import datasets
    from waveome_tpu.fit import penalized_fit
    from waveome_tpu.kernels import full_kernel_build
    from waveome_tpu.models import svgp, gpr
    from waveome_tpu.search import full_kernel_search

    X = datasets.longitudinal_design(args.units, args.rate, seed=args.seed)
    n = X.shape[0]
    hold = datasets.longitudinal_design(args.units, args.rate,
                                        seed=args.seed + 1)

    truths = datasets.ground_truth_specs()
    spec_sat, names = full_kernel_build(
        cat_vars=[0, 1], num_vars=[2], unit_idx=0,
        var_names=["id", "treat", "time"], return_sum=True,
    )

    report = {}
    for yname, (true_spec, true_raw) in truths.items():
        Y = datasets.simulate_gp_outcomes(
            X, true_spec, true_raw, noise_sd=args.noise,
            seed=args.seed + hash(yname) % 1000,
        )
        true_feats = sorted({p.dim for c in true_spec.components
                             for p in c})

        # truth predictive at holdout (exact GP)
        mu_t, var_t = gpr_predict_truth(true_spec, true_raw, X, Y, hold,
                                        args.noise)

        entry = {}

        # (a) penalized saturated path
        config = svgp.make_config(spec_sat, "gaussian", num_data=n,
                                  input_dim=3)
        params0 = svgp.init_params(config, jnp.asarray(X))
        res = penalized_fit(config, params0, jnp.asarray(X),
                            jnp.asarray(Y), num_factor_iter=0,
                            max_iter=args.max_iter)
        mask = np.asarray(res.component_mask)
        kept = [names[i] for i in range(len(names)) if mask[i] > 0]
        kname = "+".join(kept)
        mu_p, var_p = svgp.predict_y(
            config, res.params, jnp.asarray(hold),
            component_mask=jnp.asarray(res.component_mask),
            factor_mask=jnp.asarray(res.factor_mask),
        )
        import re

        feats = sorted({
            int(d) for k in kept
            for d in re.findall(r"\[(\d+)\]", _to_idx(k))
        })
        entry["penalized"] = {
            "kernel": kname,
            "recovery": datasets.feature_recovery_score(
                true_feats, "+".join(f"x[{f}]" for f in feats)
            ),
            "holdout_mse": datasets.holdout_mse(mu_t, np.asarray(mu_p)),
            "kl_to_truth": datasets.gaussian_kl(
                mu_t, var_t, np.asarray(mu_p), np.asarray(var_p)
            ),
        }

        # (b) greedy search
        if not args.skip_search:
            sres = full_kernel_search(
                X, Y, kern_list=["squared_exponential", "matern12",
                                 "linear"],
                cat_vars=[0, 1], max_depth=3, num_restart=1,
                max_iter=args.max_iter, random_seed=args.seed,
            )
            best = sres["best_model_name"]
            entry["search"] = {
                "kernel": best,
                "recovery": datasets.feature_recovery_score(
                    true_feats, best
                ),
                "var_exp": sres["var_exp"],
            }

        report[yname] = entry
        print(f"{yname}: {json.dumps(entry, default=str)}")

    print(json.dumps(report, indent=2, default=str))


def _to_idx(kernel_name: str) -> str:
    # names from full_kernel_build use var names; map back to indices
    return (kernel_name.replace("[id]", "[0]")
            .replace("[treat]", "[1]").replace("[time]", "[2]"))


def gpr_predict_truth(spec, raw, X, Y, Xnew, noise_sd):
    import jax.numpy as jnp

    from waveome_tpu.kernels.gram import gram

    X = jnp.asarray(X, jnp.float64)
    Xnew = jnp.asarray(Xnew, jnp.float64)
    N = X.shape[0]
    K = np.asarray(gram(spec, raw, X)) + noise_sd ** 2 * np.eye(N)
    Ks = np.asarray(gram(spec, raw, X, Xnew))
    kss = np.asarray(gram(spec, raw, Xnew))
    sol = np.linalg.solve(K, np.asarray(Y)[:, 0])
    mu = Ks.T @ sol
    var = np.diag(kss - Ks.T @ np.linalg.solve(K, Ks)) + noise_sd ** 2
    return mu, var


if __name__ == "__main__":
    main()
