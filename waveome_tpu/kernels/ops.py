"""Primitive kernel gram functions (pure, 1-D active dimension).

TPU-native re-provision of the reference's kernel zoo: the custom kernels in
``waveome/kernels.py`` (Lin :5-39, Poly :42-83, Categorical :86-124,
Empty :127-142) and the GPflow-borrowed kernels the reference uses
(SquaredExponential, Matern12, Periodic(SE), ArcCosine, Polynomial, Linear,
Constant — see SURVEY.md §2.2).

Every primitive is a pure function ``k(p, x1, x2) -> gram`` where ``p`` is a
vector of ``N_PARAM_SLOTS`` *constrained* parameter values and ``x1``/``x2``
are 1-D slices of the design matrix. Distances are formed with broadcasting
(``x1[:, None] - x2[None, :]``) — on TPU these become VPU elementwise tiles
that XLA fuses into the surrounding sum-of-products gram assembly, so no
intermediate N×N buffers hit HBM per primitive.

Parameter slot layout (see spec.py):
    slot 0: variance
    slot 1: lengthscale / weight_variance (arccosine)
    slot 2: period (periodic) / offset (polynomial) / bias_variance (arccos)
            / alpha (rational_quadratic)
    slot 3: reserved
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# Op codes — stable integers so kernel *structure* can be passed as data
# (arrays of op codes) into a single compiled objective. This is the central
# TPU-first design move replacing GPflow kernel object trees: every search
# candidate / pruned model with the same padded shape shares one XLA program.
EMPTY = 0
CONSTANT = 1
SQUARED_EXPONENTIAL = 2
MATERN12 = 3
MATERN32 = 4
MATERN52 = 5
LINEAR = 6
POLYNOMIAL = 7
PERIODIC = 8
ARCCOSINE = 9
CATEGORICAL = 10
RATIONAL_QUADRATIC = 11

OP_NAMES = {
    EMPTY: "empty",
    CONSTANT: "constant",
    SQUARED_EXPONENTIAL: "squared_exponential",
    MATERN12: "matern12",
    MATERN32: "matern32",
    MATERN52: "matern52",
    LINEAR: "linear",
    POLYNOMIAL: "polynomial",
    PERIODIC: "periodic",
    ARCCOSINE: "arccosine",
    CATEGORICAL: "categorical",
    RATIONAL_QUADRATIC: "rational_quadratic",
}
OP_CODES = {v: k for k, v in OP_NAMES.items()}

N_PARAM_SLOTS = 4

# Which slots each op actually uses (for param-existence masks).
OP_PARAM_SLOTS = {
    EMPTY: (),
    CONSTANT: (0,),
    SQUARED_EXPONENTIAL: (0, 1),
    MATERN12: (0, 1),
    MATERN32: (0, 1),
    MATERN52: (0, 1),
    LINEAR: (0,),
    POLYNOMIAL: (0, 2),
    PERIODIC: (0, 1, 2),
    ARCCOSINE: (0, 1, 2),
    CATEGORICAL: (0,),
    RATIONAL_QUADRATIC: (0, 1, 2),
}


def _sqdist(x1, x2):
    d = x1[:, None] - x2[None, :]
    return d * d


def _absdist(x1, x2):
    return jnp.abs(x1[:, None] - x2[None, :])


# Numerical safety for scale-like parameters: softplus underflows to exactly
# 0 for very negative raw values (which gradient-free directions of L-BFGS
# can reach on pruned components), making r/ℓ = inf and 0·inf = NaN in
# *gradients* at perfectly finite loss values. Flooring ℓ and clipping the
# exponent keeps both value and gradient finite without measurably changing
# the kernel anywhere the optimizer actually lives.
_LS_FLOOR = 1e-10
_EXP_CLIP = 80.0


def _safe_ls(ls):
    return jnp.maximum(ls, _LS_FLOOR)


def _nexp(u):
    """exp(−u) with u clipped: exp(−80) ≈ 1.8e−35 ≈ 0, gradient-safe."""
    return jnp.exp(-jnp.minimum(u, _EXP_CLIP))


# --- full gram functions: (p, x1, x2) -> (N1, N2) ---


def k_empty(p, x1, x2, degree=3.0, order=1):
    """Zero kernel — ``Empty`` (kernels.py:127-142) and padding slot."""
    return jnp.zeros((x1.shape[0], x2.shape[0]), dtype=x1.dtype)


def k_constant(p, x1, x2, degree=3.0, order=1):
    return jnp.full((x1.shape[0], x2.shape[0]), p[0], dtype=x1.dtype)


def k_squared_exponential(p, x1, x2, degree=3.0, order=1):
    ls = _safe_ls(p[1])
    return p[0] * _nexp(0.5 * _sqdist(x1, x2) / (ls * ls))


def k_matern12(p, x1, x2, degree=3.0, order=1):
    return p[0] * _nexp(_absdist(x1, x2) / _safe_ls(p[1]))


def k_matern32(p, x1, x2, degree=3.0, order=1):
    r = math.sqrt(3.0) * _absdist(x1, x2) / _safe_ls(p[1])
    return p[0] * (1.0 + r) * _nexp(r)


def k_matern52(p, x1, x2, degree=3.0, order=1):
    r = math.sqrt(5.0) * _absdist(x1, x2) / _safe_ls(p[1])
    return p[0] * (1.0 + r + r * r / 3.0) * _nexp(r)


def k_linear(p, x1, x2, degree=3.0, order=1):
    """σ²·x·x2ᵀ — both gpflow Linear and the custom ``Lin`` (kernels.py:19-31)."""
    return p[0] * (x1[:, None] * x2[None, :])


def k_polynomial(p, x1, x2, degree=3.0, order=1):
    """(σ²·x·x2ᵀ + offset)^degree — ``Poly`` (kernels.py:56-74)."""
    return (p[0] * (x1[:, None] * x2[None, :]) + p[2]) ** degree


def k_periodic(p, x1, x2, degree=3.0, order=1):
    """Periodic(SE base): σ² exp(−2 sin²(π·r/period)/ℓ²) (gpflow semantics)."""
    s = (jnp.sin(math.pi * (x1[:, None] - x2[None, :]) / _safe_ls(p[2]))
         / _safe_ls(p[1]))
    return p[0] * _nexp(2.0 * s * s)


def _arccos_J(theta, order):
    if order == 0:
        return math.pi - theta
    if order == 1:
        return jnp.sin(theta) + (math.pi - theta) * jnp.cos(theta)
    # order == 2
    c = jnp.cos(theta)
    return 3.0 * jnp.sin(theta) * c + (math.pi - theta) * (1.0 + 2.0 * c * c)


def k_arccosine(p, x1, x2, degree=3.0, order=1):
    """ArcCosine kernel of static ``order`` (gpflow semantics).

    slot1 = weight_variance, slot2 = bias_variance (1-D active dim).
    """
    w, b = p[1], p[2]
    d1 = w * x1 * x1 + b
    d2 = w * x2 * x2 + b
    full = w * (x1[:, None] * x2[None, :]) + b
    cos_theta = full / jnp.sqrt(jnp.maximum(d1[:, None] * d2[None, :],
                                            1e-30))
    jitter = 1e-15
    theta = jnp.arccos(jitter + (1.0 - 2.0 * jitter) * cos_theta)
    J = _arccos_J(theta, order)
    if order == 0:
        scale = 1.0
    else:
        scale = (d1[:, None] * d2[None, :]) ** (order / 2.0)
    return p[0] / math.pi * J * scale


def k_categorical(p, x1, x2, degree=3.0, order=1):
    """σ²·1[round(x)==round(x2)] — ``Categorical`` (kernels.py:95-117)."""
    eq = jnp.round(x1)[:, None] == jnp.round(x2)[None, :]
    return p[0] * eq.astype(x1.dtype)


def k_rational_quadratic(p, x1, x2, degree=3.0, order=1):
    alpha = p[2]
    ls = _safe_ls(p[1])
    return p[0] * (1.0 + _sqdist(x1, x2) / (2.0 * alpha * ls * ls)) ** (
        -alpha
    )


# --- diagonal variants: (p, x) -> (N,) ---


def kdiag_empty(p, x, degree=3.0, order=1):
    return jnp.zeros_like(x)


def kdiag_constant(p, x, degree=3.0, order=1):
    return jnp.full_like(x, p[0])


def _kdiag_stationary(p, x, degree=3.0, order=1):
    return jnp.full_like(x, p[0])


def kdiag_linear(p, x, degree=3.0, order=1):
    """σ²·x² (kernels.py:34-39)."""
    return p[0] * x * x


def kdiag_polynomial(p, x, degree=3.0, order=1):
    return (p[0] * x * x + p[2]) ** degree


def kdiag_arccosine(p, x, degree=3.0, order=1):
    d = p[1] * x * x + p[2]
    theta = jnp.zeros_like(x)
    J = _arccos_J(theta, order)
    if order == 0:
        scale = 1.0
    else:
        scale = d ** order
    return p[0] / math.pi * J * scale


def kdiag_categorical(p, x, degree=3.0, order=1):
    """σ²·1 (kernels.py:119-124)."""
    return jnp.full_like(x, p[0])


GRAM_FNS = {
    EMPTY: k_empty,
    CONSTANT: k_constant,
    SQUARED_EXPONENTIAL: k_squared_exponential,
    MATERN12: k_matern12,
    MATERN32: k_matern32,
    MATERN52: k_matern52,
    LINEAR: k_linear,
    POLYNOMIAL: k_polynomial,
    PERIODIC: k_periodic,
    ARCCOSINE: k_arccosine,
    CATEGORICAL: k_categorical,
    RATIONAL_QUADRATIC: k_rational_quadratic,
}

DIAG_FNS = {
    EMPTY: kdiag_empty,
    CONSTANT: kdiag_constant,
    SQUARED_EXPONENTIAL: _kdiag_stationary,
    MATERN12: _kdiag_stationary,
    MATERN32: _kdiag_stationary,
    MATERN52: _kdiag_stationary,
    LINEAR: kdiag_linear,
    POLYNOMIAL: kdiag_polynomial,
    PERIODIC: _kdiag_stationary,
    ARCCOSINE: kdiag_arccosine,
    CATEGORICAL: kdiag_categorical,
    RATIONAL_QUADRATIC: _kdiag_stationary,
}
