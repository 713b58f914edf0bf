"""The penalized (horseshoe) fit pipeline for one outcome — fully jittable.

Re-implements the per-outcome worker of ``GPSearch.penalized_optimization``
(``model_search.py:251-393``) as one pure function:

  1. auto penalization factor 2·1.1·σ̂·√N·Φ⁻¹(1 − 0.1/2p)
     (model_search.py:284-289);
  2. L-BFGS fit of the horseshoe-penalized SVGP ELBO
     (the reference's scipy branch, model_classes.py:299-342);
  3. optional iterative factor re-estimation from the residual SD with
     early exit / previous-parameter restore (model_search.py:332-375);
  4. component pruning by variance cutoff then lengthscale rule
     (``cut_kernel_components``, model_classes.py:1029-1079 +
     utilities.py:1136-1184) — as masks, not structure surgery;
  5. per-component feature importances (utilities.py:614-707).

Because every step is shape-static, the whole pipeline vmaps over outcomes
and shards across a TPU mesh — this is the Ray-farm replacement and the
benchmark workload (BASELINE.md).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.scipy.special import ndtri

from ..interpret.importance import feature_importance
from ..kernels.gram import component_variances
from ..likelihoods import needs_loss_guard
from ..models import svgp
from ..optimize import lbfgs_fit, random_restart_fit


class PenalizedFitResult(NamedTuple):
    params: dict
    penalization_factor: jnp.ndarray
    component_mask: jnp.ndarray  # (C,) 0/1 after pruning
    factor_mask: jnp.ndarray  # (C, F) 0/1 after lengthscale pruning
    importances: jnp.ndarray  # (C+1,) incl. residual share
    loss: jnp.ndarray
    num_iters: jnp.ndarray


def auto_penalization_factor(sigma_hat, n_obs, num_var_components,
                             dtype=None):
    """2·1.1·σ̂·√N·Φ⁻¹(1 − 0.1/(2p)) (model_search.py:284-289)."""
    if dtype is None:
        # f64 under x64 parity mode, else the f32 fast path — requesting
        # f64 unconditionally only triggers a truncation warning.
        import jax

        dtype = jax.dtypes.canonicalize_dtype(jnp.float64)
    p = jnp.asarray(num_var_components, dtype=dtype)
    return (
        2.0 * 1.1 * sigma_hat * jnp.sqrt(jnp.asarray(n_obs, dtype=dtype))
        * ndtri(1.0 - 0.1 / (2.0 * p))
    )


def prune_masks(config, params, X, var_cutoff: float = 0.1):
    """cut_kernel_components as masks (model_classes.py:1029-1079).

    Step 1: keep components whose variance ≥ var_cutoff.
    Step 2: within kept components, drop factors whose lengthscale exceeds
    3× the input range of their active dim (utilities.py:1146-1153); a
    component losing all factors disappears.
    """
    spec = config.spec
    comp_var = component_variances(spec, params["kernel_raw"])
    comp_keep = (comp_var >= var_cutoff).astype(X.dtype)

    ls_mask = spec.lengthscale_mask()  # (C, F) has-lengthscale
    active = spec.active_factor_mask()  # (C, F)
    from ..kernels.gram import constrain

    ls = constrain(params["kernel_raw"])[..., 1]  # (C, F)
    spec_p = spec.padded()
    C, F = spec_p.num_components, spec_p.max_factors
    # per-factor input range of its active dim
    ranges = jnp.ptp(X, axis=0)  # (D,)
    dim_arr = spec_p.coded()["dims"]  # (C, F)
    fac_range = 3.0 * ranges[dim_arr]
    ls_keep = jnp.where(ls_mask, ls < fac_range, True)
    factor_mask = (active & ls_keep).astype(X.dtype)
    factor_mask = factor_mask * comp_keep[:, None]
    component_mask = (jnp.max(factor_mask, axis=1) > 0).astype(X.dtype)
    return component_mask, factor_mask


def penalized_fit(
    config,
    params0,
    X,
    Y,
    penalization_factor: Optional[float] = None,
    num_factor_iter: int = 5,
    num_restart: int = 0,
    max_iter: int = 500,
    tol: float = 1e-8,
    var_cutoff: float = 0.1,
    importance_type: str = "log_bf",
    key: Optional[jax.Array] = None,
    compute_importances: bool = True,
    use_collapsed: bool = True,
    stage: str = "all",
    batch_size: Optional[int] = None,
) -> PenalizedFitResult:
    """Full per-outcome penalized pipeline (jit/vmap-safe).

    ``batch_size``: when set (non-Gaussian path), the ELBO is trained on
    shuffled minibatches with the data term rescaled by N/batch_size
    (reference model_classes.py:384-393) via Adam + natural gradients
    instead of full-batch L-BFGS — the large-N regime.
    """
    import numpy as np

    # static numpy mask → subset optimization in the L-BFGS fitters
    mask = svgp.train_mask_np(config)
    N = X.shape[0]
    num_var = config.spec.num_variance_prior_params()
    dtype = params0["kernel_raw"].dtype

    # Gaussian fast path: optimize the collapsed (Titsias) bound over the
    # ~10 hyperparameters only; the optimal q is closed-form and is
    # materialized afterwards so the rest of the pipeline (masks,
    # importances, prediction) is unchanged. Mathematically identical to
    # the joint (q, θ) optimization the reference's scipy branch performs.
    collapsed = use_collapsed and config.likelihood.name == "gaussian"
    if collapsed:
        mask = dict(mask)
        mask["q_mu"] = np.zeros_like(mask["q_mu"])
        mask["q_sqrt_raw"] = np.zeros_like(mask["q_sqrt_raw"])
        if config.num_inducing >= X.shape[0]:
            # Z = X frozen in the exact-MLL path
            mask["z"] = np.zeros_like(mask["z"])

    auto_factor = penalization_factor is None
    if auto_factor:
        # σ̂ = std(Y) unless the iteration is disabled (model_search.py:279-283;
        # pandas .std() uses ddof=1)
        sigma_hat = (
            jnp.std(Y, ddof=1) if num_factor_iter > 0
            else jnp.asarray(1.0, dtype=dtype)
        )
        factor0 = auto_penalization_factor(sigma_hat, N, num_var, dtype)
    else:
        factor0 = jnp.asarray(penalization_factor, dtype=dtype)

    # float32 guard: a smooth barrier keeps component variances out of the
    # regions where f32 marginal-likelihood evaluation noise dwarfs real
    # objective changes (variances ≫ data scale are never meaningful for
    # standardized inputs; f64 parity mode is unaffected).
    f32_mode = dtype == jnp.float32
    var_cap = 1e3
    if f32_mode:
        # 1e-8 gradient norms are unreachable in f32 — don't burn the full
        # iteration budget chasing them
        tol = max(tol, 3e-5)

    def variance_barrier(p):
        if not f32_mode:
            return jnp.zeros((), dtype=dtype)
        from ..kernels.gram import component_variances as _cv

        v = _cv(config.spec, p["kernel_raw"])
        return jnp.sum(jax.nn.relu(v - var_cap) ** 2)

    exact_gaussian = collapsed and config.num_inducing >= N

    def loss_with(factor):
        if collapsed:
            def loss(p):
                if exact_gaussian:
                    fitobj = svgp.exact_mll(config, p, X, Y)
                else:
                    fitobj = svgp.collapsed_elbo(config, p, X, Y)
                obj = fitobj + svgp.log_prior_density(config, p, factor)
                return -obj + variance_barrier(p)
            return loss

        def loss(p):
            return svgp.training_loss(config, p, X, Y,
                                      penalization_factor=factor) + (
                variance_barrier(p)
            )
        return loss

    def fit(p, factor):
        if batch_size is not None and not collapsed:
            from ..optimize.minibatch import minibatch_fit

            scale = N / batch_size

            def batch_loss(pp, idx):
                return svgp.training_loss(
                    config, pp, X[idx], Y[idx],
                    penalization_factor=factor, scale=scale,
                ) + variance_barrier(pp)

            res = minibatch_fit(
                batch_loss, loss_with(factor), p, N, batch_size,
                key if key is not None else jax.random.PRNGKey(0),
                mask=mask, num_opt_iter=max_iter,
                loss_guard=needs_loss_guard(config.likelihood.name),
            )
            return res.params, res.loss, res.num_iters
        if num_restart > 0:
            def randomize(pp, k):
                return svgp.randomize_params(config, pp, k)

            best, best_loss = random_restart_fit(
                loss_with(factor), p, randomize,
                key if key is not None else jax.random.PRNGKey(0),
                num_restart=num_restart, mask=mask, max_iter=max_iter,
                tol=tol,
            )
            return best, best_loss, jnp.asarray(0)
        if collapsed:
            # hyperparameters only: parallel-linesearch L-BFGS (flat
            # trial grid — compiles far faster than nested zoom
            # while_loops and doesn't pay worst-case trial counts under
            # vmap; optimize/plbfgs.py)
            from ..optimize.plbfgs import plbfgs_fit

            ftol = 1e-6 if f32_mode else 1e-9
            res = plbfgs_fit(loss_with(factor), p, mask=mask,
                             max_iter=max_iter, tol=tol, ftol=ftol)
            return res.params, res.loss, res.num_iters
        # joint (q, θ) variational path: Adam + natural gradients — the
        # reference's own optimizer for large parameter sets
        # (model_classes.py:344-470). Line-search L-BFGS variants stall
        # on this objective (fixed-grid) or compile nested zoom loops.
        from ..optimize.adam import adam_natgrad_fit

        res = adam_natgrad_fit(
            loss_with(factor), p, mask=mask, num_opt_iter=max_iter,
            loss_guard=needs_loss_guard(config.likelihood.name))
        return res.params, res.loss, res.num_iters

    params, loss, iters = fit(params0, factor0)
    if collapsed:
        q_mu, q_sqrt = svgp.optimal_q(config, params, X, Y)
        params = dict(params, q_mu=q_mu, q_sqrt_raw=q_sqrt)

    if auto_factor and num_factor_iter > 0:
        # iterative re-estimation (model_search.py:332-375). The stop
        # decision is evaluated BEFORE each refit (a cheap predict_y), so a
        # converged outcome never pays a discarded fit; final params match
        # the reference's restore-on-larger/break-on-close semantics.
        def next_factor_of(p, factor):
            _, yvar = svgp.predict_y(config, p, X)
            new_sd = jnp.sqrt(jnp.mean(yvar))
            nf = auto_penalization_factor(new_sd, N, num_var, dtype)
            stop = (jnp.abs(nf - factor) <= 1e-3) | (nf > factor)
            return nf, stop

        nf0, stop0 = next_factor_of(params, factor0)

        def body(carry):
            params, factor, loss, nf, it, done = carry
            new_params, new_loss, _ = fit(params, nf)
            if collapsed:
                q_mu, q_sqrt = svgp.optimal_q(config, new_params, X, Y)
                new_params = dict(new_params, q_mu=q_mu,
                                  q_sqrt_raw=q_sqrt)
            nf2, stop = next_factor_of(new_params, nf)
            return new_params, nf, new_loss, nf2, it + 1, stop

        def cond(carry):
            *_, it, done = carry
            return (it < num_factor_iter) & ~done

        params, factor, loss, _, _, _ = jax.lax.while_loop(
            cond, body,
            (params, factor0, loss, nf0, jnp.asarray(0), stop0),
        )
    else:
        factor = factor0

    if stage == "fit":
        C = config.num_components
        Fm = config.spec.padded().max_factors
        return PenalizedFitResult(
            params=params,
            penalization_factor=factor,
            component_mask=jnp.ones((C,), dtype=dtype),
            factor_mask=jnp.ones((C, Fm), dtype=dtype),
            importances=jnp.zeros((C + 1,), dtype=dtype),
            loss=loss,
            num_iters=iters,
        )

    component_mask, factor_mask = prune_masks(config, params, X, var_cutoff)

    if compute_importances:
        importances = feature_importance(
            config, params, X, Y, component_mask=component_mask,
            factor_mask=factor_mask, return_value=importance_type,
        )
    else:
        C = config.num_components
        importances = jnp.zeros((C + 1,), dtype=dtype)

    return PenalizedFitResult(
        params=params,
        penalization_factor=factor,
        component_mask=component_mask,
        factor_mask=factor_mask,
        importances=importances,
        loss=loss,
        num_iters=iters,
    )


def penalized_finalize(
    config,
    params,
    X,
    Y,
    var_cutoff: float = 0.1,
    importance_type: str = "log_bf",
    compute_importances: bool = True,
):
    """Pruning + importances for already-fitted params (the second stage
    of the staged batch driver; same semantics as the tail of
    ``penalized_fit``)."""
    dtype = params["kernel_raw"].dtype
    component_mask, factor_mask = prune_masks(config, params, X, var_cutoff)
    if compute_importances:
        importances = feature_importance(
            config, params, X, Y, component_mask=component_mask,
            factor_mask=factor_mask, return_value=importance_type,
        )
    else:
        C = config.num_components
        importances = jnp.zeros((C + 1,), dtype=dtype)
    return component_mask, factor_mask, importances
