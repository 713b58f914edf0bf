"""Lasso-path regularized fitting (the reference's deprecated-but-live
λ path).

Re-implements ``kernel_test_reg`` (model_fitting.py:16-373) and the model
objectives it drives — ``PGPR``/``SVPGPR`` (model_types_DEPR.py): an exact
GPR (Gaussian) or variational GP (other likelihoods, Z = X) objective with

  * optional explicit penalty ``N·λ·(1/base_var^γ)·Σ variances``
    (model_types_DEPR.py:49-62),
  * Laplace(0, 1/λ) priors on kernel variances (or on W for LMC)
    (model_fitting.py:198-216),
  * Uniform(0, 10) priors on non-variance kernel params
    (model_fitting.py:236-242),
  * random restarts with best-of by log posterior, BIC/holdout scoring.

Restarts run as a vmapped axis; the fitter is jit/vmap-safe so λ×fold
grids batch into single XLA programs (see search/lam.py).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..interpret.metrics import calc_bic
from ..kernels.gram import component_variances, constrain
from ..models import svgp
from ..optimize import lbfgs_fit
from ..priors import laplace_log_prob, uniform_log_prob


class RegFitResult(NamedTuple):
    params: dict
    loglik: jnp.ndarray  # best log posterior
    bic: jnp.ndarray


def _lasso_priors(config, params, lam):
    """Laplace(0,1/λ) on trainable variances + Uniform(0,10) on other
    kernel params (softened: the uniform acts as a log-barrier bound).

    ``lam`` may be a traced scalar (λ grids share one compiled program);
    λ=0 contributes no Laplace prior."""
    dtype = params["kernel_raw"].dtype
    total = jnp.zeros((), dtype=dtype)
    lam = jnp.asarray(lam, dtype=dtype)
    variances = component_variances(config.spec, params["kernel_raw"])
    safe_lam = jnp.maximum(lam, jnp.asarray(1e-30, dtype=dtype))
    lap = jnp.sum(laplace_log_prob(variances, 0.0, 1.0 / safe_lam))
    total = total + jnp.where(lam > 0, lap, 0.0)
    # Uniform(0,10) on non-variance kernel params (model_fitting.py:236-242)
    vals = constrain(params["kernel_raw"])
    nonvar_np = np.array(config.spec._param_exists_np())
    nonvar_np[..., 0] = False
    nonvar = jnp.asarray(nonvar_np)
    lp = uniform_log_prob(vals, 0.0, 10.0)
    total = total + jnp.sum(jnp.where(nonvar, lp, 0.0))
    return total


def _explicit_penalty(config, params, X, lam, gam, base_variances):
    """N·λ·(1/base_var^γ)·Σ variances (model_types_DEPR.py:49-62).
    ``lam``/``gam`` may be traced scalars; λ=0 contributes nothing."""
    dtype = params["kernel_raw"].dtype
    lam = jnp.asarray(lam, dtype=dtype)
    variances = component_variances(config.spec, params["kernel_raw"])
    if base_variances is None:
        w = jnp.ones_like(variances)
    else:
        w = 1.0 / (jnp.asarray(base_variances, dtype=variances.dtype) ** gam)
    pen = X.shape[0] * lam * jnp.sum(w * variances)
    return jnp.where(lam > 0, pen, jnp.zeros((), dtype=dtype))


def kernel_test_reg(
    X,
    Y,
    spec,
    likelihood: str = "gaussian",
    lasso: bool = False,
    lam: float = 0.0,
    gam: float = 0.0,
    base_variances=None,
    num_restarts: int = 5,
    random_init: bool = True,
    use_priors: bool = True,
    max_iter: int = 300,
    random_seed: Optional[int] = None,
    num_inducing_points: int = 500,
    X_holdout=None,
    Y_holdout=None,
    split: bool = False,
    use_explicit_penalty: bool = False,
    weights=None,
) -> RegFitResult:
    """Restart-loop regularized fit. jit/vmap-safe.

    ``weights``: optional per-row 0/1 weights (CV folds without reshaping).
    """
    from ..config import default_float

    dtype = default_float()
    X = jnp.asarray(X, dtype=dtype)
    Y = jnp.asarray(Y, dtype=dtype).reshape(-1, 1)
    N = X.shape[0]

    config = svgp.make_config(
        spec, likelihood, num_data=N, input_dim=X.shape[1],
        num_inducing_points=num_inducing_points,
    )
    params0 = svgp.init_params(config, X,
                               key=jax.random.PRNGKey(random_seed or 0),
                               dtype=dtype)
    mask = svgp.train_mask(config, params0)

    def objective(p):
        el = svgp.elbo(config, p, X, Y, weights=weights)
        lp = el
        if use_priors:
            lp = lp + _lasso_priors(config, p, lam if lasso else 0.0)
        if use_explicit_penalty:
            lp = lp - _explicit_penalty(config, p, X, lam, gam,
                                        base_variances)
        return lp

    def loss(p):
        return -objective(p)

    n_fits = max(num_restarts, 1)
    keys = jax.random.split(jax.random.PRNGKey(random_seed or 0), n_fits)

    def one(key):
        p0 = dict(params0)
        if random_init:
            k1, k2 = jax.random.split(key)
            p0["kernel_raw"] = jnp.where(
                mask["kernel_raw"],
                jax.random.normal(k1, params0["kernel_raw"].shape,
                                  dtype=dtype),
                params0["kernel_raw"],
            )
            p0["lik_raw"] = jax.random.normal(
                k2, params0["lik_raw"].shape, dtype=dtype
            )
        res = lbfgs_fit(loss, p0, mask=mask, max_iter=max_iter)
        return res.params, -res.loss

    all_params, logliks = jax.vmap(one)(keys)
    ll = jnp.where(jnp.isfinite(logliks), logliks, -jnp.inf)
    best = jnp.argmax(ll)
    best_params = jax.tree.map(lambda a: a[best], all_params)
    best_ll = logliks[best]

    if split:
        hold = jnp.sum(svgp.predict_log_density(
            config, best_params, jnp.asarray(X_holdout, dtype=dtype),
            jnp.asarray(Y_holdout, dtype=dtype).reshape(-1, 1),
        ))
        bic = -hold
    else:
        k = spec.num_trainable_kernel_params() + (
            config.likelihood.n_params + 3
        )
        bic = calc_bic(best_ll, N, k)

    return RegFitResult(params=best_params, loglik=best_ll, bic=bic), config
