"""Exact GP regression (dense Cholesky path).

Re-provides the reference's deprecated-but-live exact models: ``PGPR``
(model_types_DEPR.py:14-68, Cholesky log-marginal-likelihood with an explicit
L1-style penalty ``N·λ·(1/base_var^γ)·Σ variances``) used by
``kernel_test_reg`` (model_fitting.py) on the lasso/λ path.

On TPU this is the dense-Cholesky workhorse; for large N the gram assembly
feeds the Pallas-tiled path (waveome_tpu/pallas_ops) — XLA's batched
Cholesky handles the factorization.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..bijectors import softplus
from ..config import default_jitter
from ..kernels.gram import component_variances, gram, gram_diag
from ..kernels.spec import KernelSpec


def init_params(spec: KernelSpec, dtype):
    from ..bijectors import softplus_inv

    return {
        "kernel_raw": spec.init_raw_params(dtype=dtype),
        "mean_c": jnp.zeros((1,), dtype=dtype),
        "noise_raw": jnp.asarray(
            [softplus_inv(1.0 - 1e-6)], dtype=dtype
        ),  # gpflow Gaussian lower bound 1e-6
    }


def noise_variance(params):
    return softplus(params["noise_raw"][0]) + 1e-6


def log_marginal_likelihood(spec: KernelSpec, params, X, Y,
                            component_mask=None):
    """Standard Cholesky NLML (model_types_DEPR.py:49-56 semantics)."""
    N = X.shape[0]
    K = gram(spec, params["kernel_raw"], X, component_mask=component_mask)
    Ky = K + (noise_variance(params) + 0.0) * jnp.eye(N, dtype=K.dtype)
    L = jnp.linalg.cholesky(Ky + default_jitter() * 0.0 * jnp.eye(N))
    err = Y - params["mean_c"][0]
    alpha = jax.scipy.linalg.cho_solve((L, True), err)
    quad = jnp.sum(err * alpha)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diag(L)))
    return -0.5 * (quad + logdet + N * math.log(2.0 * math.pi))


def penalized_lml(spec: KernelSpec, params, X, Y, lam: float = 0.0,
                  gam: float = 0.0, base_variances=None,
                  component_mask=None):
    """LML − N·λ·(1/base_var^γ)·Σ component variances
    (model_types_DEPR.py:49-62)."""
    lml = log_marginal_likelihood(spec, params, X, Y, component_mask)
    if lam == 0.0:
        return lml
    variances = component_variances(spec, params["kernel_raw"])
    if base_variances is None:
        weights = jnp.ones_like(variances)
    else:
        weights = 1.0 / (jnp.asarray(base_variances) ** gam)
    penalty = X.shape[0] * lam * jnp.sum(weights * variances)
    return lml - penalty


def predict_f(spec: KernelSpec, params, X, Y, Xnew, full_cov=False,
              component_mask=None):
    """Exact GPR posterior."""
    N = X.shape[0]
    K = gram(spec, params["kernel_raw"], X, component_mask=component_mask)
    Ky = K + noise_variance(params) * jnp.eye(N, dtype=K.dtype)
    L = jnp.linalg.cholesky(Ky)
    Ks = gram(spec, params["kernel_raw"], X, Xnew,
              component_mask=component_mask)
    err = Y - params["mean_c"][0]
    alpha = jax.scipy.linalg.cho_solve((L, True), err)
    fmean = Ks.T @ alpha + params["mean_c"][0]
    V = jax.scipy.linalg.solve_triangular(L, Ks, lower=True)
    if full_cov:
        Kss = gram(spec, params["kernel_raw"], Xnew,
                   component_mask=component_mask)
        return fmean, Kss - V.T @ V
    kss = gram_diag(spec, params["kernel_raw"], Xnew,
                    component_mask=component_mask)
    return fmean, (kss - jnp.sum(V * V, axis=0))[:, None]
