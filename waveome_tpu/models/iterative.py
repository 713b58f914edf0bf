"""Matmul-based exact-GP marginal likelihood (BBMM-style iterative path).

The Cholesky factorization XLA emits for the exact Gaussian objective
(``svgp.exact_mll``) maps poorly onto the MXU: batched 500x500 factorizations
run at a few hundred GFLOP/s while batched dense matmuls run orders of
magnitude faster. Following the GPyTorch/BBMM recipe (PAPERS.md), this module
evaluates the same objective with only matmuls:

  * quadratic term   y^T K^-1 y         via batched conjugate gradients,
  * log determinant  log|K|             via stochastic Lanczos quadrature
                                        (SLQ) on the CG tridiagonal
                                        coefficients with fixed Rademacher
                                        probes,
  * gradients        via a custom VJP:  dMLL/dK = 1/2 (alpha alpha^T - K^-1),
                                        with K^-1 replaced by the stochastic
                                        probe estimator (1/s) sum_i w_i z_i^T.

With the probes held FIXED per fit (common random numbers), the estimator is
a deterministic, smooth function of the hyperparameters, so the parallel
line search in optimize/plbfgs.py sees a consistent surrogate objective.
The final reported loss / BIC / predictions are computed with the exact
Cholesky path at the optimized parameters (fit/batch.py finalize stage).

Reference workload being accelerated: the per-outcome penalized fits of
``penalized_optimization`` (model_search.py:197-517), whose per-model
objective evaluation is GPflow's dense-Cholesky SVGP/GPR loss.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def make_probes(key, n: int, num_probes: int, dtype) -> jnp.ndarray:
    """Fixed Rademacher probe block Z of shape (n, num_probes)."""
    return jax.random.rademacher(key, (n, num_probes), dtype=dtype)


def _mbcg(Ky, rhs, n_iter: int):
    """Batched conjugate gradients on a block of right-hand sides.

    Returns (X, alphas, betas, valids) where X approximates Ky^-1 rhs and
    (alphas, betas, valids) are the per-iteration CG coefficients
    ((n_iter, R) each) from which the Lanczos tridiagonal is rebuilt.
    Breakdown-safe: an rhs whose residual collapses (or that meets a
    non-positive curvature direction in float32) freezes, monotonically.
    """
    dtype = rhs.dtype
    eps = jnp.asarray(1e-30 if dtype == jnp.float64 else 1e-20, dtype)
    rs0 = jnp.sum(rhs * rhs, axis=0)
    rtol2 = (1e-12 if dtype == jnp.float64 else 1e-10)

    def body(carry, _):
        x, r, p, rs, active = carry
        Kp = Ky @ p
        pKp = jnp.sum(p * Kp, axis=0)
        ok = active & (pKp > eps) & (rs > rtol2 * rs0)
        safe_pKp = jnp.where(ok, pKp, 1.0)
        alpha = jnp.where(ok, rs / safe_pKp, 0.0)
        x = x + alpha * p
        r_new = r - alpha * Kp
        rs_new = jnp.sum(r_new * r_new, axis=0)
        safe_rs = jnp.where(ok, rs, 1.0)
        beta = jnp.where(ok, rs_new / safe_rs, 0.0)
        p = jnp.where(ok, r_new + beta * p, p)
        r = jnp.where(ok, r_new, r)
        rs = jnp.where(ok, rs_new, rs)
        return (x, r, p, rs, ok), (alpha, beta, ok)

    x0 = jnp.zeros_like(rhs)
    active0 = jnp.ones(rhs.shape[1], dtype=bool)
    (x, *_), (alphas, betas, valids) = jax.lax.scan(
        body, (x0, rhs, rhs, rs0, active0), None, length=n_iter
    )
    return x, alphas, betas, valids


def _slq_logdet(alphas, betas, valids, n: int):
    """log|Ky| estimate from CG coefficients of the probe columns.

    Builds each probe's Lanczos tridiagonal T (diag 1/a_k + b_{k-1}/a_{k-1},
    offdiag sqrt(b_{k-1})/a_{k-1}), eigen-decomposes it, and applies
    Gaussian quadrature: logdet ~ mean_i n * e1^T log(T_i) e1 (Rademacher
    probes have ||z||^2 = n). Frozen iterations enter as decoupled
    identity blocks, which the e1 projection ignores exactly.
    """
    t, s = alphas.shape
    dtype = alphas.dtype
    safe_a = jnp.where(valids, alphas, 1.0)
    diag = jnp.where(valids, 1.0 / safe_a, 1.0)  # (t, s)
    prev_term = betas[:-1] / safe_a[:-1]
    diag = diag.at[1:].add(jnp.where(valids[1:], prev_term, 0.0))
    off = jnp.where(
        valids[1:],
        jnp.sqrt(jnp.maximum(betas[:-1], 0.0)) / safe_a[:-1],
        0.0,
    )  # (t-1, s)

    def one(d, o):
        T = jnp.diag(d) + jnp.diag(o, 1) + jnp.diag(o, -1)
        w, V = jnp.linalg.eigh(T)
        w = jnp.maximum(w, jnp.asarray(1e-30, dtype))
        return jnp.sum(V[0, :] ** 2 * jnp.log(w)) * n

    ld = jax.vmap(one, in_axes=(1, 1))(diag, off)  # (s,)
    return jnp.mean(ld)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def mll_iterative(Ky, y, probes, n_iter: int):
    """-1/2 y^T Ky^-1 y - 1/2 log|Ky| - n/2 log(2 pi), matmul-only.

    Same quantity as the Cholesky form in ``svgp.exact_mll``
    (reference objective: GPflow GPR/SVGP marginal likelihood,
    model_classes.py:817-835) up to CG/SLQ approximation error.
    """
    out, _ = _mll_fwd(Ky, y, probes, n_iter)
    return out


def _mll_fwd(Ky, y, probes, n_iter: int):
    n = y.shape[0]
    rhs = jnp.concatenate([y[:, None], probes], axis=1)
    X, alphas, betas, valids = _mbcg(Ky, rhs, n_iter)
    quad = jnp.sum(y * X[:, 0])
    logdet = _slq_logdet(alphas[:, 1:], betas[:, 1:], valids[:, 1:], n)
    mll = -0.5 * quad - 0.5 * logdet - 0.5 * n * math.log(2.0 * math.pi)
    return mll, (X, y, probes)


def _mll_bwd(n_iter: int, res, gbar):
    X, y, probes = res
    alpha = X[:, 0]
    W = X[:, 1:]
    s = probes.shape[1]
    # dMLL/dK = 1/2 alpha alpha^T - 1/2 K^-1, with K^-1 ~ sym(W Z^T)/s
    Kinv_est = (W @ probes.T + probes @ W.T) / (2.0 * s)
    dK = gbar * 0.5 * (jnp.outer(alpha, alpha) - Kinv_est)
    dy = gbar * (-alpha)
    return dK, dy, jnp.zeros_like(probes)


mll_iterative.defvjp(_mll_fwd, _mll_bwd)


def exact_mll_iterative(config, params, X, Y, probes, n_iter: int = 50,
                        component_mask=None, factor_mask=None):
    """Drop-in iterative twin of ``svgp.exact_mll`` (Gaussian, M=N path)."""
    from . import svgp

    assert config.likelihood.name == "gaussian"
    N = X.shape[0]
    dtype = X.dtype
    noise = config.likelihood.constrain(params["lik_raw"])[0]
    K = svgp._K(config, params, X, X, component_mask,
                factor_mask=factor_mask)
    Ky = K + noise * jnp.eye(N, dtype=dtype)
    err = (Y - svgp._mean(config, params, X))[:, 0]
    return mll_iterative(Ky, err, probes, n_iter)
