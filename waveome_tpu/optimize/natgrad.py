"""Closed-form natural-gradient step for whitened variational parameters.

Re-provides ``gpflow.optimizers.NaturalGradient`` (used by the reference's
adam/gradient path, model_classes.py:356-364, and the LMC loop,
model_classes.py:1514-1527) in pure JAX.

Following Salimbeni et al. (2018) — the same math GPflow implements — the
step in natural parameters θ is

    θ ← θ − γ · dL/dη,     η = (m, S + m mᵀ),  θ = (S⁻¹m, −½S⁻¹)

with dL/dη obtained as the vjp of the map η ↦ ξ = (m, chol(S)) applied to
the ordinary gradient dL/dξ. Everything is Cholesky-based and vmappable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _sym(M):
    return 0.5 * (M + M.T)


def natgrad_step(grad_q_mu, grad_q_sqrt, q_mu, q_sqrt, gamma):
    """One natural-gradient step on a single latent.

    Args:
      grad_q_mu: (M, 1) dL/dq_mu.
      grad_q_sqrt: (M, M) dL/dq_sqrt (lower-triangular support).
      q_mu: (M, 1). q_sqrt: (M, M) lower-triangular.
      gamma: step size.
    Returns updated (q_mu, q_sqrt).
    """
    M = q_mu.shape[0]
    dtype = q_mu.dtype
    I = jnp.eye(M, dtype=dtype)
    Lq = jnp.tril(q_sqrt)
    S = Lq @ Lq.T

    eta1 = q_mu
    eta2 = S + q_mu @ q_mu.T

    def xi_of_eta(e1, e2):
        S_ = _sym(e2) - e1 @ e1.T
        return e1, jnp.linalg.cholesky(S_)

    _, vjp_fn = jax.vjp(xi_of_eta, eta1, eta2)
    dL_de1, dL_de2 = vjp_fn((grad_q_mu, jnp.tril(grad_q_sqrt)))

    # natural params from current q
    Sinv = jax.scipy.linalg.cho_solve((Lq, True), I)
    theta1 = Sinv @ q_mu
    theta2 = -0.5 * Sinv

    theta1_new = theta1 - gamma * dL_de1
    theta2_new = theta2 - gamma * _sym(dL_de2)

    # back to (m, chol(S)): S = (−2 θ2)⁻¹
    prec = -2.0 * _sym(theta2_new)
    Lp = jnp.linalg.cholesky(prec)
    S_new = jax.scipy.linalg.cho_solve((Lp, True), I)
    S_new = _sym(S_new)
    q_mu_new = S_new @ theta1_new
    q_sqrt_new = jnp.linalg.cholesky(S_new)
    return q_mu_new, q_sqrt_new


def natgrad_step_batched(grad_q_mu, grad_q_sqrt, q_mu, q_sqrt, gamma):
    """Vectorised over latents: q_mu (M, L), q_sqrt (L, M, M)."""
    def one(gm, gs, m, s):
        return natgrad_step(gm[:, None], gs, m[:, None], s, gamma)

    new_mu, new_sqrt = jax.vmap(one, in_axes=(1, 0, 1, 0))(
        grad_q_mu, grad_q_sqrt, q_mu, q_sqrt
    )
    return new_mu[:, :, 0].T, new_sqrt
