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
    ap.add_argument("--baselines", action="store_true",
                    help="also fit the reference harness's baseline "
                         "model families (mixed LM, LASSO, GAM, GP-ARD)")
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

        # (c) baseline model families (reference head-to-head:
        # sim_waveome_hpc_run.py fits mixed LM :221-245, LASSO :1034-1075,
        # GAM :906-951, GP-ARD :1160-1190 — numpy/JAX ports here; the
        # NB-GLM / NB-GP-ARD rows apply to the count-outcome study)
        if args.baselines:
            for bname, fit_fn in (
                ("mixed_lm", fit_mixed_lm),
                ("lasso", fit_lasso_path),
                ("gam", fit_gam),
                ("gp_ard", fit_gp_ard),
            ):
                mu_b, var_b = fit_fn(X, Y, hold)
                entry[bname] = {
                    "holdout_mse": datasets.holdout_mse(mu_t, mu_b),
                    "kl_to_truth": datasets.gaussian_kl(
                        mu_t, var_t, mu_b, var_b),
                }

        report[yname] = entry
        print(f"{yname}: {json.dumps(entry, default=str)}")

    print(json.dumps(report, indent=2, default=str))


# ---------------------------------------------------------------------------
# baseline model families (ports of the reference evaluation harness,
# examples/simulations/sim_waveome_hpc_run.py)
# ---------------------------------------------------------------------------


def _design_matrices(X, Xnew):
    """Common fixed-effect design: unit one-hots + treat + time."""
    units = np.unique(X[:, 0]).astype(int)
    def dm(A):
        oh = (A[:, 0].astype(int)[:, None] == units[None, :]).astype(float)
        return np.column_stack([oh, A[:, 1], A[:, 2], A[:, 1] * A[:, 2]])
    return dm(X), dm(Xnew)


def fit_mixed_lm(X, Y, Xnew):
    """Random-intercept linear model ≈ ridge on unit one-hots + fixed
    effects (sim_waveome_hpc_run.py:221-245 fits lmer(y ~ t*treat +
    (1|unit)); the ridge on one-hots is the classical BLUP equivalence)."""
    A, An = _design_matrices(X, Xnew)
    y = np.asarray(Y)[:, 0]
    lam = 1.0
    G = A.T @ A + lam * np.eye(A.shape[1])
    beta = np.linalg.solve(G, A.T @ y)
    resid = y - A @ beta
    s2 = float(resid @ resid) / max(len(y) - A.shape[1], 1)
    mu = An @ beta
    var = s2 * (1.0 + np.sum((An @ np.linalg.inv(G)) * An, axis=1))
    return mu, var


def fit_lasso_path(X, Y, Xnew, n_lam=20, n_iter=500):
    """L1 linear model via ISTA with a small λ grid selected by holdout
    split (sim_waveome_hpc_run.py:1034-1075 uses sklearn LassoCV)."""
    A, An = _design_matrices(X, Xnew)
    y = np.asarray(Y)[:, 0]
    mu_a, sd_a = A.mean(0), A.std(0) + 1e-12
    As = (A - mu_a) / sd_a
    ym = y.mean()
    yc = y - ym
    n = len(y)
    ntr = int(0.8 * n)
    rng = np.random.default_rng(0)
    perm = rng.permutation(n)
    tr, va = perm[:ntr], perm[ntr:]
    L = np.linalg.norm(As[tr], 2) ** 2 / ntr
    lam_max = np.max(np.abs(As[tr].T @ yc[tr])) / ntr
    lams = np.geomspace(lam_max, lam_max * 1e-3, n_lam)

    def ista(lam):
        b = np.zeros(As.shape[1])
        for _ in range(n_iter):
            g = As[tr].T @ (As[tr] @ b - yc[tr]) / ntr
            b = b - g / L
            b = np.sign(b) * np.maximum(np.abs(b) - lam / L, 0.0)
        return b

    best, best_err = None, np.inf
    for lam in lams:
        b = ista(lam)
        err = np.mean((yc[va] - As[va] @ b) ** 2)
        if err < best_err:
            best, best_err = b, err
    resid = yc - As @ best
    s2 = float(resid @ resid) / max(n - int(np.sum(best != 0)) - 1, 1)
    mu = ym + ((An - mu_a) / sd_a) @ best
    return mu, np.full(len(An), s2)


def _bspline_basis(t, n_knots=8, degree=3):
    """Cox-de Boor B-spline basis, iterative and array-safe."""
    t = np.asarray(t, float)
    interior = np.quantile(t, np.linspace(0, 1, n_knots))
    knots = np.concatenate([[interior[0]] * degree, interior,
                            [interior[-1]] * degree])
    # degree-0 indicators (right endpoint folded into last interval)
    B = np.zeros((len(t), len(knots) - 1))
    for k in range(len(knots) - 1):
        if knots[k] < knots[k + 1]:
            B[:, k] = ((knots[k] <= t) & (t < knots[k + 1])).astype(float)
    last = int(np.max(np.nonzero(np.diff(knots) > 0)))
    B[t >= knots[-1] - 1e-12, last] = 1.0
    for d in range(1, degree + 1):
        Bn = np.zeros((len(t), len(knots) - d - 1))
        for k in range(len(knots) - d - 1):
            term = np.zeros(len(t))
            den1 = knots[k + d] - knots[k]
            if den1 > 0:
                term += (t - knots[k]) / den1 * B[:, k]
            den2 = knots[k + d + 1] - knots[k + 1]
            if den2 > 0:
                term += (knots[k + d + 1] - t) / den2 * B[:, k + 1]
            Bn[:, k] = term
        B = Bn
    return B


def fit_gam(X, Y, Xnew):
    """GAM: cubic B-spline smooth of time + unit intercepts + treat
    (sim_waveome_hpc_run.py:906-951 uses mgcv-style smooths)."""
    y = np.asarray(Y)[:, 0]
    units = np.unique(X[:, 0]).astype(int)

    def dm(A):
        oh = (A[:, 0].astype(int)[:, None] == units[None, :]).astype(float)
        return np.column_stack([oh, A[:, 1],
                                _bspline_basis(A[:, 2]),
                                A[:, 1:2] * _bspline_basis(A[:, 2])])
    A, An = dm(X), dm(Xnew)
    lam = 1.0
    G = A.T @ A + lam * np.eye(A.shape[1])
    beta = np.linalg.solve(G, A.T @ y)
    resid = y - A @ beta
    s2 = float(resid @ resid) / max(len(y) - A.shape[1], 1)
    mu = An @ beta
    var = s2 * (1.0 + np.sum((An @ np.linalg.inv(G)) * An, axis=1))
    return mu, var


def fit_gp_ard(X, Y, Xnew, max_iter=150):
    """Exact GP with a single ARD squared-exponential over ALL inputs
    (incl. the integer-coded unit — the naive treatment the reference's
    GP-ARD baseline applies, sim_waveome_hpc_run.py:1160-1190), fitted
    with the framework's own machinery."""
    import jax
    import jax.numpy as jnp

    from waveome_tpu.kernels.spec import KernelSpec, Primitive
    from waveome_tpu.models import svgp
    from waveome_tpu.optimize.plbfgs import plbfgs_fit

    D = X.shape[1]
    spec = KernelSpec((tuple(
        Primitive("squared_exponential", d) for d in range(D)),))
    config = svgp.make_config(spec, "gaussian", num_data=X.shape[0],
                              input_dim=D, num_inducing_points=X.shape[0])
    Xd, Yd = jnp.asarray(X), jnp.asarray(Y)
    p0 = svgp.init_params(config, Xd)
    mask = svgp.train_mask_np(config)
    for k in ("q_mu", "q_sqrt_raw", "z"):
        mask[k] = np.zeros_like(mask[k])

    def loss(p):
        return -svgp.exact_mll(config, p, Xd, Yd)

    res = plbfgs_fit(loss, p0, mask=mask, max_iter=max_iter)
    params = dict(res.params)
    q_mu, q_sqrt = svgp.optimal_q(config, params, Xd, Yd)
    params.update(q_mu=q_mu, q_sqrt_raw=q_sqrt)
    mu, var = svgp.predict_y(config, params, jnp.asarray(Xnew))
    return np.asarray(mu)[:, 0], np.asarray(var)[:, 0]


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
