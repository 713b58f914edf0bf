"""Per-component posterior decomposition.

Re-implements ``individual_kernel_predictions`` (utilities.py:710-974):
the posterior of a single additive kernel component.

* **marginal mode** (utilities.py:819-834): predict through the SVGP
  conditional using only that component's gram — here a one-hot component
  mask over the same static graph.
* **full-conditional mode** (utilities.py:836-965): the explicit Gaussian
  conditional  μ₁ + Σ₁₂ Σ₂₂⁻¹ (y − μ₂)  with the component's cross-
  covariance Σ₁₂ against the full kernel's Σ₂₂ over the inducing/model
  data, including the q_sqrt-propagated uncertainty term. The reference
  inverts Σ₂₂ with LU (tfp lu_matrix_inverse); we use Cholesky solves
  (the TPU-native choice) with the same white-noise jitter policy.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..bijectors import to_tril
from ..models import svgp


def component_posterior_marginal(
    config, params, Xnew, kernel_idx: int, component_mask=None,
    factor_mask=None, num_samples: int = 100,
    key: Optional[jax.Array] = None, coded=None,
):
    """(mean, var, samples, cov) for one component, marginal mode."""
    C = config.num_components
    one_hot = jnp.zeros((C,), dtype=Xnew.dtype).at[kernel_idx].set(1.0)
    if component_mask is not None:
        one_hot = one_hot * component_mask
    kw = dict(component_mask=one_hot, coded=coded)
    if coded is None:
        kw["factor_mask"] = factor_mask
    mu, var = svgp.predict_f(config, params, Xnew, **kw)
    _, cov = svgp.predict_f(config, params, Xnew, full_cov=True, **kw)
    if key is None:
        key = jax.random.PRNGKey(0)
    samples = svgp.predict_f_samples(config, params, Xnew, num_samples,
                                     key, **kw)
    return mu, var, samples, cov


def component_posterior_conditional(
    config, params, Xnew, kernel_idx: int,
    model_data=None,
    component_mask=None,
    factor_mask=None,
    white_noise_amt: float = 1e-6,
    num_samples: int = 100,
    key: Optional[jax.Array] = None,
):
    """Full-conditional component posterior (utilities.py:836-965).

    ``model_data``: (X2, y2) conditioning set. The reference overwrites it
    with (inducing Z, q_mu) when inducing points exist (utilities.py:767-769)
    — we default to the same.
    """
    from ..kernels.gram import gram

    spec = config.spec
    raw = params["kernel_raw"]
    dtype = Xnew.dtype

    if model_data is None:
        X2 = params["z"]
        y2 = params["q_mu"]
    else:
        X2, y2 = model_data
    N2 = X2.shape[0]

    C = config.num_components
    one_hot = jnp.zeros((C,), dtype=dtype).at[kernel_idx].set(1.0)
    if component_mask is not None:
        one_hot = one_hot * component_mask

    # component cross/within covariances; Σ₂₂ = full kernel on model data
    sigma_21 = gram(spec, raw, X2, Xnew, component_mask=one_hot,
                    factor_mask=factor_mask)  # (N2, N1)
    sigma_11 = gram(spec, raw, Xnew, Xnew, component_mask=one_hot,
                    factor_mask=factor_mask)
    sigma_22 = gram(spec, raw, X2, X2, component_mask=component_mask,
                    factor_mask=factor_mask)
    sigma_22 = sigma_22 + white_noise_amt * jnp.eye(N2, dtype=dtype)
    sigma_12 = sigma_21.T

    L22 = jnp.linalg.cholesky(sigma_22)

    def solve22(B):
        return jax.scipy.linalg.cho_solve((L22, True), B)

    # mean function handling (utilities.py:906-925)
    if config.mean_function == "constant":
        mu1 = jnp.full((Xnew.shape[0], 1), params["mean_c"][0])
        mu2 = jnp.full((N2, 1), params["mean_c"][0])
    else:
        mu1 = jnp.zeros((Xnew.shape[0], 1), dtype=dtype)
        mu2 = jnp.zeros((N2, 1), dtype=dtype)

    pred_mu = mu1 + sigma_12 @ solve22(y2 - mu2)
    pred_cov = sigma_11 - sigma_12 @ solve22(sigma_21)

    # q_sqrt-propagated uncertainty (utilities.py:938-948)
    q_sqrt = to_tril(params["q_sqrt_raw"])
    S = q_sqrt @ q_sqrt.T
    inv_21 = solve22(sigma_21)
    pred_cov = pred_cov + inv_21.T @ (S @ inv_21)

    pred_var = jnp.diag(pred_cov)

    if key is None:
        key = jax.random.PRNGKey(0)
    jitter = 1e-6
    Lc = jnp.linalg.cholesky(
        pred_cov + jitter * jnp.eye(pred_cov.shape[0], dtype=dtype)
    )
    eps = jax.random.normal(key, (pred_cov.shape[0], num_samples),
                            dtype=dtype)
    samples = pred_mu + Lc @ eps
    # reference falls back to repeating the mean when the covariance is
    # unstable (utilities.py:964-965)
    ok = jnp.all(jnp.isfinite(Lc))
    samples = jnp.where(ok, samples,
                        jnp.repeat(pred_mu, num_samples, axis=1))
    return pred_mu, pred_var[:, None], samples, pred_cov


def individual_kernel_predictions(
    config, params, kernel_idx: int, X=None, marginal: bool = True,
    predict_type: str = "func", **kwargs,
):
    """Dispatcher mirroring utilities.py:710-974, including the
    ``predict_type='mean'`` likelihood transform (utilities.py:967-973)."""
    if marginal:
        mu, var, samples, cov = component_posterior_marginal(
            config, params, X, kernel_idx, **kwargs
        )
    else:
        mu, var, samples, cov = component_posterior_conditional(
            config, params, X, kernel_idx, **kwargs
        )
    if predict_type == "mean":
        lik = config.likelihood
        lik_p = lik.constrain(params["lik_raw"])
        samples = lik.conditional_mean(lik_p, samples)
        var = lik.conditional_variance(lik_p, mu)
        mu = lik.conditional_mean(lik_p, mu)
        cov = None
    return mu, var, samples, cov
