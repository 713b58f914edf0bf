"""Penalization-factor / λ cross-validation searches.

Re-implements the three CV drivers:

  * ``PenalizedGP.penalization_search`` (model_classes.py:866-998) —
    k-fold CV over a penalization-factor list with 1-SE-rule selection and
    best-factor refit;
  * ``lam_search`` (regularization.py:280-467) — λ (× γ) grid for the
    lasso path with the auto grid ``[0] ∪ exp(linspace(−10, log(2·var(Y))))``
    and 1.96-SE early stopping;
  * ``multioutput_lam_search`` (model_search.py:575-820) — the LMC λ CV.

TPU-native execution: fold membership is expressed as 0/1 observation
weights so every (factor × fold) cell shares one static shape; the whole
grid then fits as a single vmapped L-BFGS program instead of a joblib/Ray
process pool (SURVEY.md §2.8 row 2: "another vmapped axis").
"""

from __future__ import annotations

from functools import lru_cache

from .._variants import variant_logged
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import svgp
from ..optimize import lbfgs_fit
from .folds import make_folds


def _fold_weight_matrix(n_rows: int, folds: Sequence[np.ndarray]):
    """(n_folds, N) 0/1 train-weight rows (1 = in training set)."""
    W = np.ones((len(folds), n_rows))
    for i, f in enumerate(folds):
        W[i, f] = 0.0
    return W


def penalization_search(
    spec,
    X,
    Y,
    penalization_factor_list: Sequence[float] = (0.0, 1.0, 10.0, 100.0),
    k_fold: int = 3,
    unit_col: Optional[int] = None,
    likelihood: str = "gaussian",
    num_inducing_points: int = 500,
    max_iter: int = 300,
    selection_type: str = "se",
    fit_best: bool = True,
    random_seed: Optional[int] = None,
    verbose: bool = False,
) -> Dict:
    """K-fold CV over horseshoe penalization factors
    (model_classes.py:866-998). All (factor × fold) cells fit in one
    vmapped program; holdout scored by mean predict_log_density."""
    from ..config import default_float

    dtype = default_float()
    X = jnp.asarray(X, dtype=dtype)
    Y = jnp.asarray(Y, dtype=dtype).reshape(-1, 1)
    N = X.shape[0]
    factors = list(penalization_factor_list)

    folds = make_folds(np.asarray(X), unit_col, k_fold, random_seed)
    Wtrain = jnp.asarray(_fold_weight_matrix(N, folds), dtype=dtype)

    config = svgp.make_config(
        spec, likelihood, num_data=N, input_dim=X.shape[1],
        num_inducing_points=num_inducing_points,
    )
    params0 = svgp.init_params(config, X,
                               key=jax.random.PRNGKey(random_seed or 0),
                               dtype=dtype)

    # grid: (factor, fold) pairs
    ff = [(f, k) for f in range(len(factors)) for k in range(k_fold)]
    factor_arr = jnp.asarray([factors[f] for f, _ in ff], dtype=dtype)
    weight_arr = Wtrain[jnp.asarray([k for _, k in ff])]

    # device arrays go in as jit arguments (closure-captured device arrays
    # cost a tunnel readback per capture at lowering time on remote TPUs)
    data = (X, Y, params0)
    cell_lls = np.asarray(
        _pen_cell_fn(config, max_iter, np.dtype(dtype).name)(
            factor_arr, weight_arr, data
        )
    ).reshape(len(factors), k_fold)

    # 1-SE-rule best factor (model_classes.py:961-977)
    best_factor, best_val = None, -np.inf
    for i, f in enumerate(factors):
        vals = cell_lls[i]
        cur = np.nanmean(vals)
        if selection_type == "se":
            cur = cur - np.nanstd(vals) / np.sqrt(k_fold)
        if cur > best_val:
            best_val, best_factor = cur, f
    if best_factor is None:
        if verbose:
            print("Search error, returning no penalization")
        best_factor = 0.0
    if verbose:
        print(f"Best penalization factor found from search: {best_factor}")

    out = {
        "cv_log_lik": {factors[i]: cell_lls[i].tolist()
                       for i in range(len(factors))},
        "best_factor": best_factor,
        "results": cell_lls,
    }
    if fit_best:
        from ..fit.penalized import penalized_fit

        res = penalized_fit(config, params0, X, Y,
                            penalization_factor=best_factor,
                            num_factor_iter=0, max_iter=max_iter)
        out["final_fit"] = res
        out["config"] = config
    return out


@variant_logged
@lru_cache(maxsize=64)
def _pen_cell_fn(config, max_iter: int, dtype_name: str):
    """Jitted (factor × fold) CV cell fitter, cached on static config —
    a per-call jitted closure re-traces the whole L-BFGS program on every
    ``penalization_search`` call (the round-2 suite's λ-path cost)."""
    dtype = jnp.dtype(dtype_name)
    M, D = config.num_inducing, config.input_dim
    dummy = svgp.init_params(config, jnp.zeros((max(M, 1), D), dtype=dtype),
                             key=jax.random.PRNGKey(0), dtype=dtype)
    mask = jax.tree.map(np.asarray, svgp.train_mask(config, dummy))

    def one_cell(factor, w, data):
        X_, Y_, p0 = data

        def loss(p):
            return svgp.training_loss(config, p, X_, Y_,
                                      penalization_factor=factor,
                                      weights=w)

        res = lbfgs_fit(loss, p0, mask=mask, max_iter=max_iter)
        ld = svgp.predict_log_density(config, res.params, X_, Y_)
        holdout_mask = 1.0 - w
        return jnp.sum(ld * holdout_mask) / jnp.maximum(
            jnp.sum(holdout_mask), 1.0
        )

    return jax.jit(jax.vmap(one_cell, in_axes=(0, 0, None)))


def auto_lambda_grid(Y, num_lams: int = 20):
    """[0] ∪ exp(linspace(−10, log(2·var(Y)))) rounded to 5 decimals
    (regularization.py:347-357)."""
    max_lambda = 2.0 * float(np.var(np.asarray(Y)))
    grid = np.insert(
        np.exp(np.linspace(-10.0, np.log(max_lambda), num_lams - 1)),
        0, 0.0,
    ).round(5)
    return grid.tolist()


@variant_logged
@lru_cache(maxsize=64)
def _lam_cell_fn(spec, likelihood: str, base_variances_key,
                 max_iter: int, num_inducing_points: int, random_seed,
                 dtype_name: str):
    """Jitted λ-path fold fitter, cached on the static configuration
    (same re-trace-per-call trap as ``_pen_cell_fn``)."""
    from ..fit.lasso import kernel_test_reg

    bv = (np.asarray(base_variances_key)
          if base_variances_key is not None else None)

    def one(lam, gam, w, data):
        X_, Y_ = data
        (res, config) = kernel_test_reg(
            X_, Y_, spec, likelihood=likelihood, lasso=True, lam=lam,
            gam=gam, base_variances=bv, num_restarts=1,
            random_init=False, max_iter=max_iter,
            num_inducing_points=num_inducing_points, weights=w,
            random_seed=random_seed,
        )
        ld = svgp.predict_log_density(config, res.params, X_, Y_)
        hm = 1.0 - w
        return jnp.sum(ld * hm) / jnp.maximum(jnp.sum(hm), 1.0)

    return jax.jit(jax.vmap(one, in_axes=(None, None, 0, None)))


def lam_search(
    spec,
    X,
    Y,
    lam_list: Optional[Sequence[float]] = None,
    num_lams: int = 20,
    gam_list: Sequence[float] = (0.0,),
    k_fold: int = 5,
    unit_col: Optional[int] = None,
    likelihood: str = "gaussian",
    num_inducing_points: int = 500,
    max_iter: int = 300,
    base_variances=None,
    random_seed: Optional[int] = None,
    early_stopping: bool = True,
    fit_best: bool = True,
    prune_best: bool = True,
    verbose: bool = False,
) -> Dict:
    """λ (× γ) grid search for the lasso path (regularization.py:280-467):
    per-(λ, γ) the folds fit in one vmapped batch; 1.96-SE early stop."""
    from ..fit.lasso import kernel_test_reg

    from ..config import default_float

    dtype = default_float()
    Xn = np.asarray(X)
    N = Xn.shape[0]
    if lam_list is None:
        lam_list = auto_lambda_grid(Y, num_lams)
        if verbose:
            print(f"max lambda: {lam_list[-1]}")

    folds = make_folds(Xn, unit_col, k_fold, random_seed)
    Wtrain = jnp.asarray(_fold_weight_matrix(N, folds), dtype=dtype)

    val_log_lik: Dict = {l: {g: [] for g in gam_list} for l in lam_list}
    best = {"lam": None, "gam": None, "ll": None, "se": None}
    stop_now = False

    Xj = jnp.asarray(Xn, dtype=dtype)
    Yj = jnp.asarray(np.asarray(Y), dtype=dtype).reshape(-1, 1)

    # λ/γ enter TRACED so the whole grid reuses one compiled program
    # (a closed-over Python float would recompile per grid point); the
    # jitted cell program itself is cached on the static configuration
    cell_fn = _lam_cell_fn(
        spec, likelihood,
        tuple(np.asarray(base_variances).tolist())
        if base_variances is not None else None,
        max_iter, num_inducing_points, random_seed,
        np.dtype(dtype).name,
    )

    def fold_cells(lam, gam):
        return np.asarray(cell_fn(
            jnp.asarray(lam, dtype=dtype), jnp.asarray(gam, dtype=dtype),
            Wtrain, (Xj, Yj),
        ))

    for l_val in lam_list:
        if stop_now:
            break
        for g_val in gam_list:
            if verbose:
                print(f"lambda value = {l_val}, gamma value = {g_val}")
            lls = fold_cells(float(l_val), float(g_val))
            val_log_lik[l_val][g_val] = lls.tolist()
            mean_ll = np.nanmean(lls)
            if best["ll"] is None or best["ll"] <= mean_ll:
                best.update(
                    lam=l_val, gam=g_val, ll=mean_ll,
                    se=np.nanstd(lls) / np.sqrt(k_fold),
                )
                if verbose:
                    print(f"ll = {best['ll']}, se = {best['se']}")
            if early_stopping and mean_ll < best["ll"] - 1.96 * best["se"]:
                if verbose:
                    print("Stopping early!")
                stop_now = True

    out = {
        "cv_log_lik": val_log_lik,
        "best_lambda": best["lam"],
        "best_gamma": best["gam"],
    }
    if fit_best:
        res, config = kernel_test_reg(
            Xj, Yj, spec, likelihood=likelihood, lasso=True,
            lam=float(best["lam"] or 0.0), gam=float(best["gam"] or 0.0),
            base_variances=base_variances, num_restarts=1,
            random_init=False, max_iter=max_iter,
            num_inducing_points=num_inducing_points,
            random_seed=random_seed,
        )
        final = {"params": res.params, "bic": float(res.bic),
                 "config": config}
        if prune_best:
            # variance-threshold pruning (regularization.py:470-508)
            from ..kernels.gram import component_variances

            cv = np.asarray(
                component_variances(spec, res.params["kernel_raw"])
            )
            final["component_mask"] = (cv >= 0.001).astype(float)
        out["final_model"] = final
    return out


@variant_logged
@lru_cache(maxsize=32)
def _mo_cell_score_fn(config, dtype_name: str):
    """Jitted LMC CV-cell scorer, cached on static config."""
    from ..models import lmc

    coded = jax.tree.map(np.asarray, lmc.lmc_coded(config))

    def cell_score(p, w, Xd, Yd):
        coded_dev = jax.tree.map(jnp.asarray, coded)
        Fmu, Fvar = lmc.lmc_predict_f(config, p, Xd, coded=coded_dev)
        lik_p = config.likelihood.constrain(p["lik_raw"])
        ld = config.likelihood.predict_log_density(lik_p, Fmu, Fvar, Yd)
        hm = (1.0 - w)[:, None]
        n_vals = jnp.maximum(jnp.sum(hm) * Yd.shape[1], 1.0)
        return jnp.sum(ld * hm) / n_vals

    return jax.jit(jax.vmap(cell_score, in_axes=(0, 0, None, None)))


def multioutput_lam_search(
    X,
    Y,
    cat_vars=(),
    num_vars=(),
    unit_idx=None,
    var_names=None,
    likelihood: str = "gaussian",
    lam_list: Optional[Sequence[float]] = None,
    num_lams: int = 20,
    k_fold: int = 5,
    kernel_options=None,
    sparse_options=None,
    num_opt_iter: int = 1000,
    random_seed: Optional[int] = None,
    prune: bool = True,
    prune_threshold: float = 0.1,
    verbose: bool = False,
    mesh=None,
    use_mesh: bool = True,
) -> Dict:
    """CV of the LMC penalization factor (model_search.py:575-820).

    TPU-native: folds become 0/1 observation weights (static shapes) and
    the whole (λ × fold) grid fits as ONE vmapped program
    (``lmc.fit_lmc_cells``) — replacing the reference's Ray task per cell
    (model_search.py:707-761). With multiple devices (or an explicit
    ``mesh``) the cell axis is sharded across the mesh."""
    from ..config import default_float
    from ..models import lmc

    Xn, Yn = np.asarray(X), np.asarray(Y)
    N = Xn.shape[0]
    if lam_list is None:
        lam_list = auto_lambda_grid(Yn, num_lams)

    folds = make_folds(Xn, unit_idx, k_fold, random_seed)
    Wtrain = _fold_weight_matrix(N, folds)

    config, latent_names = lmc.make_lmc_config(
        Xn, Yn, likelihood=likelihood, cat_vars=cat_vars,
        num_vars=num_vars, unit_idx=unit_idx, var_names=var_names,
        kernel_options=kernel_options,
        num_inducing_points=(sparse_options or {}).get(
            "num_inducing_points", 100
        ),
        verbose=verbose,
    )
    params0 = lmc.init_lmc_params(config, Xn, seed=random_seed or 0)

    # (λ × fold) grid as one vmapped axis
    cells = [(li, ki) for li in range(len(lam_list))
             for ki in range(k_fold)]
    lam_arr = np.asarray([lam_list[li] for li, _ in cells])
    w_arr = Wtrain[np.asarray([ki for _, ki in cells])]

    if mesh is None and use_mesh and len(jax.devices()) > 1:
        from ..parallel import mesh as meshlib

        mesh = meshlib.outcome_mesh()
    params_k, _ = lmc.fit_lmc_cells(
        config, params0, Xn, Yn, lam_arr, w_arr,
        num_opt_iter=num_opt_iter, mesh=mesh,
    )

    # holdout mean predict_log_density per cell (model_search.py:692-697)
    dtype = default_float()
    scores = np.asarray(_mo_cell_score_fn(config, np.dtype(dtype).name)(
        params_k, jnp.asarray(w_arr, dtype=dtype),
        jnp.asarray(Xn, dtype=dtype), jnp.asarray(Yn, dtype=dtype),
    )).reshape(len(lam_list), k_fold)

    cv_ll: Dict = {}
    best = {"lam": None, "ll": -np.inf}
    for i, l_val in enumerate(lam_list):
        lls = scores[i].tolist()
        cv_ll[float(l_val)] = lls
        mean_ll = np.nanmean(scores[i])
        if verbose:
            print(f"lambda {l_val}: mean CV ll {mean_ll:.4f}")
        if mean_ll > best["ll"]:
            best.update(lam=float(l_val), ll=mean_ll)

    # refit best λ on full data (model_search.py:791-812)
    result = lmc.fit_multioutput(
        Xn, Yn, likelihood=likelihood, cat_vars=cat_vars,
        num_vars=num_vars, unit_idx=unit_idx, var_names=var_names,
        kernel_options=kernel_options, sparse_options=sparse_options,
        penalization_factor=best["lam"] or 1.0,
        num_opt_iter=num_opt_iter, random_seed=random_seed,
        prune=prune, prune_threshold=prune_threshold, verbose=verbose,
    )
    return {"cv_log_lik": cv_ll, "best_lambda": best["lam"],
            "final_model": result}
