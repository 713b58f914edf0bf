"""Hamiltonian Monte Carlo over model posteriors.

Re-provides ``hmc_sampling`` (utilities.py:310-363): TFP HMC with dual-
averaging step-size adaptation over the model's log posterior, as a pure
JAX implementation (lax.scan over leapfrog chains; vmappable across chains
and across outcomes). Parameters without priors get the reference's default
Gamma(2, 2) prior (utilities.py:322-324).
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from .priors import gamma_log_prob


class HMCResult(NamedTuple):
    samples: dict  # pytree with leading sample axis (constrained space)
    unconstrained_samples: jnp.ndarray
    traces: jnp.ndarray  # acceptance flags
    step_size: jnp.ndarray


def _leapfrog(grad_fn, q, p, step_size, num_steps):
    def body(carry, _):
        q, p = carry
        p = p + 0.5 * step_size * grad_fn(q)
        q = q + step_size * p
        p = p + 0.5 * step_size * grad_fn(q)
        return (q, p), None

    (q, p), _ = jax.lax.scan(body, (q, p), None, length=num_steps)
    return q, p


def hmc_sampling(
    log_prob_fn: Callable,
    params0,
    burn_in: int = 500,
    samples: int = 1000,
    random_seed: Optional[int] = None,
    step_size: float = 0.01,
    accept_prob: float = 0.9,
    num_adaptation_steps: int = 100,
    num_leapfrog_steps: int = 10,
    constrain_fn: Optional[Callable] = None,
) -> HMCResult:
    """Sample the unconstrained parameter posterior.

    ``log_prob_fn(params_pytree) -> scalar`` is the target (e.g. a closure
    over ``svgp.log_posterior``); ``constrain_fn`` maps a sampled pytree to
    constrained space for reporting (the reference's
    ``convert_to_constrained_values``, utilities.py:357).
    """
    key = jax.random.PRNGKey(random_seed or 0)
    flat0, unravel = ravel_pytree(params0)
    dim = flat0.shape[0]

    def logp(x):
        return log_prob_fn(unravel(x))

    grad_fn = jax.grad(logp)

    def hmc_step(carry, key):
        q, log_step = carry
        k1, k2 = jax.random.split(key)
        p = jax.random.normal(k1, (dim,), dtype=flat0.dtype)
        current_logp = logp(q)
        current_K = 0.5 * jnp.sum(p ** 2)
        q_new, p_new = _leapfrog(grad_fn, q, p, jnp.exp(log_step),
                                 num_leapfrog_steps)
        new_logp = logp(q_new)
        new_K = 0.5 * jnp.sum(p_new ** 2)
        log_accept = jnp.minimum(
            0.0, (new_logp - new_K) - (current_logp - current_K)
        )
        log_accept = jnp.where(jnp.isfinite(log_accept), log_accept,
                               -jnp.inf)
        accept = jnp.log(jax.random.uniform(k2, dtype=flat0.dtype)) < (
            log_accept
        )
        q = jnp.where(accept, q_new, q)
        return (q, log_step), (q, accept, jnp.exp(log_accept))

    # --- burn-in with simple step-size adaptation (Robbins-Monro toward
    # target acceptance, the role of SimpleStepSizeAdaptation) ---
    def adapt_step(carry, inp):
        (q, log_step), (key, t) = carry, inp
        (q, _), (_, accept, p_acc) = hmc_step((q, log_step), key)
        adapting = t < num_adaptation_steps
        log_step = jnp.where(
            adapting,
            log_step + 0.1 * (p_acc - accept_prob),
            log_step,
        )
        return (q, log_step), None

    keys = jax.random.split(key, burn_in + samples + 1)
    (q, log_step), _ = jax.lax.scan(
        adapt_step,
        (flat0, jnp.log(jnp.asarray(step_size, dtype=flat0.dtype))),
        (keys[:burn_in], jnp.arange(burn_in)),
    )

    # --- sampling ---
    def sample_step(carry, key):
        carry, (qs, accept, _) = hmc_step(carry, key)
        return carry, (qs, accept)

    (_, _), (chain, accepts) = jax.lax.scan(
        sample_step, (q, log_step), keys[burn_in:burn_in + samples]
    )

    constrained = jax.vmap(
        lambda x: (constrain_fn or (lambda p: p))(unravel(x))
    )(chain)
    return HMCResult(
        samples=constrained,
        unconstrained_samples=chain,
        traces=accepts,
        step_size=jnp.exp(log_step),
    )


def default_gamma_prior_logprob(params, exclude=()):
    """Σ Gamma(2,2) log-densities over constrained positive params — the
    reference's fallback prior for parameters without one
    (utilities.py:322-324)."""
    total = 0.0
    for name, leaf in params.items():
        if name in exclude:
            continue
        total = total + jnp.sum(gamma_log_prob(jnp.abs(leaf) + 1e-12,
                                               2.0, 2.0))
    return total
