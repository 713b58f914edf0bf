"""Likelihoods as pure functions (log-prob, moments, variational expectations).

Re-provides the reference's likelihood layer: the custom NegativeBinomial /
ZeroInflatedNegativeBinomial (``waveome/likelihoods.py:16-139``) and the
GPflow-borrowed Gaussian / Poisson / Bernoulli / Gamma / Exponential
(``utilities.py:989-1009`` crosswalk), in closed form where GPflow has one
and 20-point Gauss–Hermite quadrature otherwise (GPflow's default).

Each likelihood owns a tiny constrained-parameter vector; bijectors follow
the reference exactly (NB ``alpha`` uses Exp — likelihoods.py:24-28; others
use softplus; Gaussian noise has GPflow's 1e-6 lower bound).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np
from jax.scipy.special import gammaln
from jax.scipy.stats import norm as jnorm

from . import bijectors
from .config import default_float

_GH_POINTS = 20
_gh_x, _gh_w = np.polynomial.hermite.hermgauss(_GH_POINTS)
_gh_logw = np.log(_gh_w / math.sqrt(math.pi))


def gauss_hermite(fn, Fmu, Fvar):
    """∫ fn(f) N(f | Fmu, Fvar) df per element, 20-point Gauss–Hermite."""
    x = jnp.asarray(_gh_x, dtype=Fmu.dtype)
    w = jnp.asarray(_gh_w / math.sqrt(math.pi), dtype=Fmu.dtype)
    f = Fmu[..., None] + jnp.sqrt(2.0 * Fvar[..., None]) * x
    return jnp.sum(fn(f) * w, axis=-1)


def gauss_hermite_logspace(log_fn, Fmu, Fvar):
    """log ∫ exp(log_fn(f)) N(f|Fmu,Fvar) df via logsumexp quadrature."""
    x = jnp.asarray(_gh_x, dtype=Fmu.dtype)
    logw = jnp.asarray(_gh_logw, dtype=Fmu.dtype)
    f = Fmu[..., None] + jnp.sqrt(2.0 * Fvar[..., None]) * x
    from jax.scipy.special import logsumexp

    return logsumexp(log_fn(f) + logw, axis=-1)


def _safe_exp(F):
    """exp with clipped argument — exp-link means stay finite (and their
    gradients too) when a line-search probes extreme latent values."""
    return jnp.exp(jnp.clip(F, -80.0, 80.0))


def nb_log_prob(m, Y, alpha):
    """NB log-pmf parameterised by mean m and dispersion alpha
    (likelihoods.py:68-79), in a float32-stable rearrangement.

    The naive form ``gammaln(k+Y) - gammaln(Y+1) + Y*log(m/(m+k)) - ...``
    sums terms of magnitude ~Y·log(Y) that cancel to O(log Y); at the
    real-data scale (iHMP metabolite intensities reach 3e10) each term is
    ~7e11 and float32's 1e-7 relative error destroys the optimization
    signal. Here every large-magnitude cancellation is done analytically:

    - ``gammaln(Y+k) - gammaln(Y+1)`` via Stirling with the 1/(12z)
      correction, combined algebraically so only O(k·log Y) terms remain
      (exact gammaln below Y=100, where f32 gammaln is accurate);
    - ``Y·log(m/(m+k)) = -Y·softplus(log k - log m)`` and
      ``k·log1p(m·alpha) = k·softplus(log m - log k)`` — stable for all
      magnitudes of m/k (no overflow, no catastrophic rounding).
    """
    import jax

    k = 1.0 / alpha
    log_k = -jnp.log(alpha)
    log_m = jnp.log(m)
    a = Y + 1.0
    d = k - 1.0
    z = Y + k
    # exact branch (small Y): plain gammaln difference
    delta_exact = gammaln(k + Y) - gammaln(a)
    # Stirling branch (large Y), cancellation done analytically:
    # logΓ(z) ≈ (z-.5)logz - z + .5log2π + 1/(12z)  ⇒
    # Δ = (a-.5)·log1p(d/a) + d·log z - d - d/(12az)
    a_s = jnp.maximum(a, 2.0)
    z_s = jnp.maximum(z, 1.0)
    delta_big = (
        (a_s - 0.5) * jnp.log1p(d / a_s)
        + d * jnp.log(z_s)
        - d
        - d / (12.0 * a_s * z_s)
    )
    delta = jnp.where(Y < 100.0, delta_exact, delta_big)
    return (
        delta
        - gammaln(k)
        - Y * jax.nn.softplus(log_k - log_m)
        - k * jax.nn.softplus(log_m - log_k)
    )


@dataclasses.dataclass(frozen=True)
class Likelihood:
    """Static likelihood description + pure-function interface."""

    name: str
    param_names: Tuple[str, ...] = ()
    param_inits: Tuple[float, ...] = ()
    param_bijectors: Tuple[str, ...] = ()  # "softplus" | "exp"
    param_lower: Tuple[float, ...] = ()

    @property
    def n_params(self) -> int:
        return len(self.param_names)

    def init_raw(self, dtype=None):
        dtype = dtype or default_float()
        raws = []
        for v, bij, lo in zip(self.param_inits, self.param_bijectors,
                              self.param_lower):
            if bij == "exp":
                raws.append(float(np.log(v)))
            else:
                # numpy softplus-inverse (safe inside jit traces)
                raws.append(float(np.log(np.expm1(v - lo))))
        return jnp.asarray(raws, dtype=dtype)

    def constrain(self, raw):
        outs = []
        for i, (bij, lo) in enumerate(
            zip(self.param_bijectors, self.param_lower)
        ):
            if bij == "exp":
                outs.append(jnp.exp(raw[i]))
            else:
                # float32 fast path: the Gaussian noise floor is raised to
                # 1e-4 — below that, f32 evaluation noise in the marginal-
                # likelihood terms (~‖y‖²/σ²) dwarfs real objective changes
                # and the optimizer chases garbage. float64 keeps the
                # reference's 1e-6 (GPflow) bound.
                if (self.name == "gaussian"
                        and raw.dtype == jnp.float32):
                    lo = max(lo, 1e-4)
                outs.append(bijectors.softplus(raw[i]) + lo)
        if not outs:
            return jnp.zeros((0,), dtype=raw.dtype)
        return jnp.stack(outs)

    # --- interface (dispatch on self.name; static per model) ---

    def log_prob(self, p, F, Y):
        return _LOG_PROB[self.name](p, F, Y)

    def conditional_mean(self, p, F):
        return _COND_MEAN[self.name](p, F)

    def conditional_variance(self, p, F):
        return _COND_VAR[self.name](p, F)

    def variational_expectations(self, p, Fmu, Fvar, Y):
        fn = _VAR_EXP.get(self.name)
        if fn is not None:
            return fn(p, Fmu, Fvar, Y)
        return gauss_hermite(lambda f: _LOG_PROB[self.name](p, f, Y[..., None]),
                             Fmu, Fvar)

    def predict_mean_and_var(self, p, Fmu, Fvar):
        fn = _PRED_MV.get(self.name)
        if fn is not None:
            return fn(p, Fmu, Fvar)
        # generic quadrature: E[y], Var[y] (gpflow ScalarLikelihood default)
        Ey = gauss_hermite(lambda f: _COND_MEAN[self.name](p, f), Fmu, Fvar)
        Eyy = gauss_hermite(
            lambda f: _COND_VAR[self.name](p, f)
            + _COND_MEAN[self.name](p, f) ** 2,
            Fmu, Fvar,
        )
        return Ey, Eyy - Ey ** 2

    def predict_log_density(self, p, Fmu, Fvar, Y):
        fn = _PRED_LD.get(self.name)
        if fn is not None:
            return fn(p, Fmu, Fvar, Y)
        return gauss_hermite_logspace(
            lambda f: _LOG_PROB[self.name](p, f, Y[..., None]), Fmu, Fvar
        )


# ---------------------------------------------------------------------------
# per-likelihood pure functions (p = constrained param vector)
# ---------------------------------------------------------------------------

# Gaussian
def _g_logp(p, F, Y):
    return -0.5 * (jnp.log(2 * math.pi) + jnp.log(p[0]) + (Y - F) ** 2 / p[0])


def _g_ve(p, Fmu, Fvar, Y):
    return (
        -0.5 * jnp.log(2 * math.pi)
        - 0.5 * jnp.log(p[0])
        - 0.5 * ((Y - Fmu) ** 2 + Fvar) / p[0]
    )


def _g_pmv(p, Fmu, Fvar):
    return Fmu, Fvar + p[0]


def _g_pld(p, Fmu, Fvar, Y):
    v = Fvar + p[0]
    return -0.5 * (jnp.log(2 * math.pi) + jnp.log(v) + (Y - Fmu) ** 2 / v)


# Poisson (exp link, binsize 1)
def _poisson_ll_stable(F, Y, s):
    """``Y·F - exp(F+s) - gammaln(Y+1)`` in a float32-stable form
    (s=0: log-pmf; s=Fvar/2: the closed-form variational expectation).

    The naive form sums ``Y·F`` and ``gammaln(Y+1)`` — each ~Y·log Y —
    that cancel to O(Y·(F - log Y)); at the Breastmilk intensity scale
    (Y ~ 3e8, terms ~6e9) float32's ULP of 512 erases the optimization
    signal, the same failure mode fixed for NB in ``nb_log_prob``. With
    ``t = F - log Y`` and Stirling's ``gammaln(Y+1) ≈ (Y+.5)·log Y - Y
    + .5·log 2π + 1/(12Y)`` the cancellation is done analytically:

        ll ≈ Y·t - Y·expm1(t+s) - .5·log(2πY) - 1/(12Y)

    — every term is O(Y·t) near the optimum (expm1 keeps the small-t
    regime exact). Exact gammaln below Y=100 where f32 is accurate.
    """
    exact = Y * F - _safe_exp(F + s) - gammaln(Y + 1.0)
    Ys = jnp.maximum(Y, 1.0)
    t = F - jnp.log(Ys)
    big = (
        Y * t
        - Y * jnp.expm1(jnp.clip(t + s, -80.0, 80.0))
        - 0.5 * jnp.log(2.0 * math.pi * Ys)
        - 1.0 / (12.0 * Ys)
    )
    return jnp.where(Y < 100.0, exact, big)


def _p_logp(p, F, Y):
    return _poisson_ll_stable(F, Y, 0.0)


def _p_ve(p, Fmu, Fvar, Y):
    return _poisson_ll_stable(Fmu, Y, Fvar / 2.0)


def _p_pmv(p, Fmu, Fvar):
    m = _safe_exp(Fmu + Fvar / 2.0)
    return m, m + m ** 2 * (jnp.exp(jnp.clip(Fvar, -80.0, 80.0)) - 1.0)


# Bernoulli (probit link — gpflow default)
def _b_logp(p, F, Y):
    sign = 2.0 * Y - 1.0
    return jnorm.logcdf(sign * F)


def _b_pmv(p, Fmu, Fvar):
    prob = jnorm.cdf(Fmu / jnp.sqrt(1.0 + Fvar))
    return prob, prob - prob ** 2


def _b_pld(p, Fmu, Fvar, Y):
    prob = jnorm.cdf(Fmu / jnp.sqrt(1.0 + Fvar))
    return jnp.log(jnp.where(Y > 0.5, prob, 1.0 - prob))


# Gamma (exp link; shape param)
def _gam_logp(p, F, Y):
    scale = _safe_exp(F)
    return (
        -p[0] * F - gammaln(p[0]) + (p[0] - 1.0) * jnp.log(Y) - Y / scale
    )


def _gam_ve(p, Fmu, Fvar, Y):
    return (
        -p[0] * Fmu
        - gammaln(p[0])
        + (p[0] - 1.0) * jnp.log(Y)
        - Y * _safe_exp(-Fmu + Fvar / 2.0)
    )


def _gam_pmv(p, Fmu, Fvar):
    m = p[0] * jnp.exp(Fmu + Fvar / 2.0)
    # E[var] + Var[mean] under lognormal scale
    e_scale2 = jnp.exp(2.0 * Fmu + 2.0 * Fvar)
    var = p[0] * e_scale2 + p[0] ** 2 * (e_scale2 - jnp.exp(2 * Fmu + Fvar))
    return m, var


# Exponential (exp link)
def _e_logp(p, F, Y):
    return -F - Y * _safe_exp(-F)


def _e_ve(p, Fmu, Fvar, Y):
    return -Fmu - Y * _safe_exp(-Fmu + Fvar / 2.0)


# Negative binomial
def _nb_logp(p, F, Y):
    return nb_log_prob(_safe_exp(F), Y, p[0])


def _nb_pmv(p, Fmu, Fvar):
    """Plug-in moments at Fmu — matches the reference's override
    (likelihoods.py:48-51), which ignores Fvar."""
    m = _safe_exp(Fmu)
    return m, m + m ** 2 * p[0]


# Zero-inflated negative binomial (likelihoods.py:96-139)
def _zinb_logp(p, F, Y):
    import jax

    alpha, km = p[0], p[1]
    m = _safe_exp(F)
    psi = 1.0 - m / (km + m)
    # -k·log1p(m·alpha) = -k·softplus(log m - log k): no overflow at huge m
    nb_zero = -jax.nn.softplus(jnp.log(m) + jnp.log(alpha)) / alpha
    log_p_zero = jnp.logaddexp(jnp.log(psi), jnp.log1p(-psi) + nb_zero)
    log_p_nonzero = jnp.log1p(-psi) + nb_log_prob(m, Y, alpha)
    return jnp.where(Y == 0, log_p_zero, log_p_nonzero)


def _zinb_mean(p, F):
    alpha, km = p[0], p[1]
    m = _safe_exp(F)
    psi = 1.0 - m / (km + m)
    return m * (1.0 - psi)


def _zinb_var(p, F):
    alpha, km = p[0], p[1]
    m = _safe_exp(F)
    psi = 1.0 - m / (km + m)
    return m * (1.0 - psi) * (1.0 + m * (psi + alpha))


_LOG_PROB = {
    "gaussian": _g_logp,
    "poisson": _p_logp,
    "bernoulli": _b_logp,
    "gamma": _gam_logp,
    "exponential": _e_logp,
    "negative_binomial": _nb_logp,
    "zeroinflated_negativebinomial": _zinb_logp,
}

_COND_MEAN = {
    "gaussian": lambda p, F: F,
    "poisson": lambda p, F: _safe_exp(F),
    "bernoulli": lambda p, F: jnorm.cdf(F),
    "gamma": lambda p, F: p[0] * _safe_exp(F),
    "exponential": lambda p, F: _safe_exp(F),
    "negative_binomial": lambda p, F: _safe_exp(F),
    "zeroinflated_negativebinomial": _zinb_mean,
}

_COND_VAR = {
    "gaussian": lambda p, F: jnp.full_like(F, p[0]),
    "poisson": lambda p, F: _safe_exp(F),
    "bernoulli": lambda p, F: jnorm.cdf(F) - jnorm.cdf(F) ** 2,
    "gamma": lambda p, F: p[0] * _safe_exp(F) ** 2,
    "exponential": lambda p, F: _safe_exp(F) ** 2,
    "negative_binomial": lambda p, F: _safe_exp(F) + _safe_exp(F) ** 2 * p[0],
    "zeroinflated_negativebinomial": _zinb_var,
}

_VAR_EXP = {
    "gaussian": _g_ve,
    "poisson": _p_ve,
    "gamma": _gam_ve,
    "exponential": _e_ve,
}

_PRED_MV = {
    "gaussian": _g_pmv,
    "poisson": _p_pmv,
    "bernoulli": _b_pmv,
    "negative_binomial": _nb_pmv,
}

_PRED_LD = {
    "gaussian": _g_pld,
    "bernoulli": _b_pld,
}


_REGISTRY = {
    "gaussian": Likelihood(
        "gaussian", ("variance",), (1.0,), ("softplus",), (1e-6,)
    ),
    "poisson": Likelihood("poisson"),
    "bernoulli": Likelihood("bernoulli"),
    "gamma": Likelihood("gamma", ("shape",), (1.0,), ("softplus",), (0.0,)),
    "exponential": Likelihood("exponential"),
    "negative_binomial": Likelihood(
        "negative_binomial", ("alpha",), (1.0,), ("exp",), (0.0,)
    ),
    "zeroinflated_negativebinomial": Likelihood(
        "zeroinflated_negativebinomial",
        ("alpha", "km"),
        (1.0, 1.0),
        ("softplus", "softplus"),
        (0.0, 0.0),
    ),
}


# Exp-link likelihoods whose Fisher information grows unboundedly with
# the observed values (Poisson: Var(y|f)=e^f; Gamma/Exponential rate
# links): at real count scales (y ~ 1e6+, e.g. the Breastmilk
# metabolome) the natural-gradient step in natural-parameter space
# jumps to a Newton-like target nearly independent of gamma and the
# next iteration's variational precision goes indefinite -> NaN. These
# need the loss-guarded variational update (optimize/adam.py
# natgrad_apply). NB/ZINB (Fisher bounded by 1/alpha) and Bernoulli
# (bounded by 1) take the plain fast natgrad step.
_UNBOUNDED_FISHER = frozenset({"poisson", "gamma", "exponential"})


def needs_loss_guard(name: str) -> bool:
    """True when ``adam_natgrad_fit`` should enable the (4x-forward-cost)
    loss-guarded variational update for this likelihood."""
    return name in _UNBOUNDED_FISHER


def gp_likelihood_crosswalk(likelihood_str: str) -> Likelihood:
    """String → likelihood (utilities.py:989-1009)."""
    s = likelihood_str.lower()
    if s in ("binomial", "bernoulli"):
        s = "bernoulli"
    elif s in ("negativebinomial", "negative_binomial"):
        s = "negative_binomial"
    if s not in _REGISTRY:
        raise ValueError(
            "Unknown likelihood. Options: 'gaussian', 'poisson', 'binomial',"
            " 'bernoulli', 'gamma', 'exponential', 'negativebinomial',"
            " 'zeroinflated_negativebinomial'."
        )
    return _REGISTRY[s]
