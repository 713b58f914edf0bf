"""Model-quality metrics: BIC, deviance explained, residuals, R²,
Bhattacharyya distance.

Re-implements the metrics layer of ``waveome/utilities.py``:
  * ``calc_bic`` (utilities.py:77-95) — note the reference's active formula
    is ``2k − 2·loglik`` (AIC form, the ``n`` argument unused); reproduced
    verbatim for score parity.
  * ``calc_deviance_explained`` (utilities.py:517-611).
  * ``calc_residuals`` (utilities.py:191-227).
  * ``calc_rsquare`` (utilities.py:131-188).
  * ``calc_bhattacharyya_dist`` (utilities.py:230-263).

All are pure functions of (likelihood, params, data, predictions) so they
jit and vmap across outcomes / components.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp

from ..likelihoods import Likelihood, nb_log_prob


def calc_bic(loglik, n: int, k: int):
    """2k − 2·loglik (utilities.py:94-95; AIC form despite the name)."""
    return 2.0 * k - 2.0 * loglik


def _gaussian_logpdf(x, mu, var):
    return -0.5 * (jnp.log(2 * math.pi * var) + (x - mu) ** 2 / var)


def deviance_logliks(
    likelihood: Likelihood,
    lik_params,
    Y,
    model_mu,
    base_mu=None,
):
    """Per-point (base_ll, mod_ll, sat_ll) triples
    (calc_deviance_explained(..., return_loglik=True),
    utilities.py:543-586)."""
    name = likelihood.name
    Y = Y.reshape(-1)
    model_mu = model_mu.reshape(-1)
    if name == "gaussian":
        y_var = jnp.var(Y)
        sat = _gaussian_logpdf(Y, Y, y_var)
        base = _gaussian_logpdf(
            Y, jnp.mean(Y) if base_mu is None else base_mu, y_var
        )
        mod = _gaussian_logpdf(Y, model_mu, y_var)
    elif name == "poisson":
        # Each log-lik is returned CENTERED on the saturated one,
        # computed analytically: pois(y,m) − pois(y,y) =
        # y·log(m/y) − (m − y), so the ~y·log y gammaln and y·log m
        # terms never materialize. Every consumer (deviance ratios,
        # importance scores) uses only differences of these values, and
        # at the Breastmilk intensity scale (y ~ 3e8) the uncentered
        # form's pre-rounded ~6e9 terms would leave ULP≈512 noise in
        # exactly those differences.
        ys = jnp.maximum(Y, 1e-12)

        def pois_rel(m):
            m = jnp.maximum(m, 1e-12)
            return Y * jnp.log(m / ys) - (m - ys)

        sat = jnp.zeros_like(Y)
        base = pois_rel(jnp.mean(Y) if base_mu is None else base_mu)
        mod = pois_rel(model_mu)
    elif name == "bernoulli":
        def bern(y, p):
            p = jnp.clip(p, 1e-12, 1 - 1e-12)
            return jnp.where(y > 0.5, jnp.log(p), jnp.log1p(-p))

        sat = bern(Y, Y)
        base = bern(Y, jnp.mean(Y) if base_mu is None else base_mu)
        mod = bern(Y, model_mu)
    elif name in ("negative_binomial", "zeroinflated_negativebinomial"):
        # utilities.py:559-581. NOTE (documented quirk): ZINB deviance
        # reuses the plain-NB formula with the ZINB's alpha — i.e. the
        # zero-inflation mass ψ is IGNORED, so ZINB deviances/importances
        # are computed under the wrong zero probability. This reproduces
        # the reference's behavior exactly (its likelihood-name dispatch
        # does the same, utilities.py:559); kept for score parity rather
        # than corrected. See docs/PARITY_NOTES.md.
        alpha = lik_params[0]
        sat = nb_log_prob(Y + 1e-6, Y, alpha)
        bm = (
            jnp.maximum(1e-6, jnp.mean(Y)) if base_mu is None else base_mu
        )
        base = nb_log_prob(bm, Y, alpha)
        mod = nb_log_prob(model_mu, Y, alpha)
    else:
        raise ValueError(
            f"Unknown likelihood '{name}' to calculate deviance"
        )
    return base, mod, sat


def calc_deviance_explained(
    likelihood: Likelihood,
    lik_params,
    Y,
    model_mu,
    base_mu=None,
    aggregate: bool = True,
):
    """Deviance explained (utilities.py:588-611)."""
    base, mod, sat = deviance_logliks(likelihood, lik_params, Y, model_mu,
                                      base_mu)
    if aggregate:
        null_dev = jnp.maximum(0.0, 2.0 * jnp.sum(sat - base))
        model_dev = jnp.maximum(0.0, 2.0 * jnp.sum(sat - mod))
        return jnp.where(null_dev > 0, 1.0 - model_dev / null_dev, 0.0)
    null_dev = jnp.clip(2.0 * (sat - base), 0.0, jnp.inf)
    model_dev = jnp.clip(2.0 * (sat - mod), 0.0, jnp.inf)
    # reference: np.divide(..., out=ones, where=null!=0) then 1 − ratio
    ratio = jnp.where(null_dev != 0,
                      model_dev / jnp.where(null_dev != 0, null_dev, 1.0),
                      1.0)
    return 1.0 - ratio


def calc_residuals(
    likelihood: Likelihood,
    lik_params,
    Y,
    fmean,
    resid_type: str = "raw",
):
    """raw / pearson / deviance residuals (utilities.py:191-227).

    ``fmean`` is the latent posterior mean; conditional moments are taken at
    fmean exactly as the reference does (utilities.py:203-205).
    """
    Y = Y.reshape(-1)
    fmean = fmean.reshape(-1)
    mean_resp = likelihood.conditional_mean(lik_params, fmean)
    var_resp = likelihood.conditional_variance(lik_params, fmean)
    if resid_type == "raw":
        return Y - mean_resp
    if resid_type == "pearson":
        return (Y - mean_resp) / jnp.sqrt(var_resp)
    if resid_type == "deviance":
        base, mod, sat = deviance_logliks(
            likelihood, lik_params, Y, mean_resp
        )
        null_dev = jnp.clip(2.0 * (sat - base), 0.0, jnp.inf)
        model_dev = jnp.clip(2.0 * (sat - mod), 0.0, jnp.inf)
        return null_dev, model_dev
    raise ValueError("resid_type can only be 'raw', 'pearson', 'deviance'")


def calc_rsquare_total(Y, y_mu):
    """Total R² = 1 − SSR/SSE (utilities.py:151-160)."""
    Y = Y.reshape(-1)
    y_mu = y_mu.reshape(-1)
    sse = jnp.sum((Y - jnp.mean(Y)) ** 2)
    ssr = jnp.sum((Y - y_mu) ** 2)
    return 1.0 - ssr / sse


def calc_rsquare_components(Y, y_mu_full, y_mu_components):
    """Per-component R² attribution (utilities.py:162-188):
    rsq_c = total_rsq · (1 − ssr_c / Σ ssr), plus residual share last.

    ``y_mu_components``: (C, N) leave-out or single-component predictions
    (the reference uses component predictions via
    individual_kernel_predictions).
    """
    total = calc_rsquare_total(Y, y_mu_full)
    ssr = jnp.sum((y_mu_full.reshape(1, -1) - y_mu_components) ** 2, axis=1)
    shares = total * (1.0 - ssr / jnp.sum(ssr))
    return jnp.concatenate([shares, jnp.asarray([1.0 - total])])


def calc_bhattacharyya_dist(mu1, cov1, mu2, cov2):
    """Closed-form Bhattacharyya distance between two GP posteriors
    (utilities.py:230-263). The reference's version only uses the
    covariance term; the full closed form adds the mean term — we keep
    both but weight the mean term as standard."""
    cov_all = (cov1 + cov2) / 2.0
    diff = (mu1 - mu2).reshape(-1, 1)
    sol = jnp.linalg.solve(cov_all, diff)
    term_mean = 0.125 * (diff.T @ sol)[0, 0]
    s_all = jnp.linalg.slogdet(cov_all)[1]
    s1 = jnp.linalg.slogdet(cov1)[1]
    s2 = jnp.linalg.slogdet(cov2)[1]
    term_cov = 0.5 * (s_all - 0.5 * (s1 + s2))
    return term_mean + term_cov
