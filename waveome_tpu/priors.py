"""Prior log-densities as pure functions.

Re-provides the TFP distributions the reference leans on
(``tfd.Horseshoe`` in model_classes.py:857-859 and :1374-1378,
``tfd.Laplace``/``tfd.Uniform`` priors in model_fitting.py:198-242,
``tfd.Gamma`` fallback priors in utilities.py:322-324) as hand-written
JAX log-pdfs so they can live inside jitted / vmapped objectives.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import nn
from jax.scipy.special import gammaln

# Constants of the TFP Horseshoe log-prob approximation. The exact horseshoe
# density has no closed form; TFP (and therefore the reference, via
# tfd.Horseshoe) uses this soft-plus based approximation, which we reproduce
# exactly so that NLL parity with the reference holds to ~1e-6.
_G = 0.5614594835668851  # exp(-euler_gamma)
_B = 1.0420764938351215  # sqrt(2 * (1 - g) / (g * (2 - g)))
_H_INF = 1.0801359952503342  # (1-g) * (g*g - 6g + 12) / (3g * (2-g)**2 * b)


def horseshoe_log_prob(x, scale):
    """log p(x) for Horseshoe(scale), matching tfp.distributions.Horseshoe.

    Used for the penalization prior on kernel variances
    (model_classes.py:857-864) with ``scale = 1 / penalization_factor``
    and on LMC mixing weights W (model_classes.py:1374-1378).
    """
    x = jnp.asarray(x)
    scale = jnp.asarray(scale, dtype=x.dtype)
    xx_raw = (x / scale) ** 2 / 2.0

    # The horseshoe density has a (log-log) spike at 0. Once the optimizer
    # shrinks a variance hard, xx underflows and ∂/∂xx of the formula
    # overflows (g/xx² → inf), so clamping alone still yields NaN
    # *gradients* via inf·0. Double-where: evaluate the formula at a benign
    # point where xx is tiny, and splice in the (constant, zero-gradient)
    # value at the clamp instead.
    tiny = 1e-60 if x.dtype == jnp.float64 else 1e-12
    bad = xx_raw < tiny
    xx = jnp.where(bad, jnp.ones_like(xx_raw), xx_raw)

    def formula(xx):
        q = 20.0 / 47.0 * xx ** 1.0919284281983377
        h = 1.0 / (1.0 + xx ** 1.5) + _H_INF * q / (1.0 + q)
        c = -0.5 * math.log(2.0 * math.pi ** 3) - jnp.log(_G * scale)
        z = math.log1p(-_G) - math.log(_G)
        return (
            -nn.softplus(z - xx / (1.0 - _G))
            + jnp.log(jnp.log1p(_G / xx - (1.0 - _G) / (h + _B * xx) ** 2))
            + c
        )

    lp_good = formula(xx)
    lp_clamped = formula(jnp.full_like(xx_raw, tiny))  # constant w.r.t. x
    return jnp.where(bad, lp_clamped, lp_good)


def laplace_log_prob(x, loc, scale):
    """log Laplace(x; loc, scale) — lasso prior (model_fitting.py:198-216)."""
    x = jnp.asarray(x)
    return -jnp.abs(x - loc) / scale - jnp.log(2.0 * scale)


def uniform_log_prob(x, low, high):
    """log Uniform(x; low, high) (model_fitting.py:236-242)."""
    x = jnp.asarray(x)
    inside = (x >= low) & (x <= high)
    return jnp.where(inside, -jnp.log(high - low), -jnp.inf)


def gamma_log_prob(x, concentration, rate):
    """log Gamma(x; α, β) — HMC default prior (utilities.py:322-324)."""
    x = jnp.asarray(x)
    return (
        concentration * jnp.log(rate)
        - gammaln(concentration)
        + (concentration - 1.0) * jnp.log(x)
        - rate * x
    )


def normal_log_prob(x, loc, scale):
    x = jnp.asarray(x)
    return -0.5 * (((x - loc) / scale) ** 2 + jnp.log(2.0 * math.pi)) - jnp.log(
        scale
    )


def exponential_log_prob(x, rate):
    x = jnp.asarray(x)
    return jnp.log(rate) - rate * x
