"""Parameter transforms (bijectors) as pure functions.

Replaces the TFP/GPflow bijector machinery the reference inherits
(``gpflow.utilities.positive()`` = Softplus used on every kernel variance /
lengthscale, ``tfp.bijectors.Exp`` on the NB ``alpha``
(likelihoods.py:24-28), and the ``fill_triangular`` transform on ``q_sqrt``).

All transforms map unconstrained ("raw") reals to the constrained domain and
are applied inside jitted objectives so XLA fuses them with the gram / ELBO
computation.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import nn


def softplus(x):
    """positive() forward: log(1 + exp(x)), numerically stable."""
    return nn.softplus(x)


def softplus_grad(x):
    """d softplus / dx = sigmoid(x)."""
    return nn.sigmoid(x)


def softplus_inv(y):
    """positive() inverse: log(exp(y) - 1) = y + log1p(-exp(-y))."""
    y = jnp.asarray(y)
    return y + jnp.log(-jnp.expm1(-y))


def exp(x):
    return jnp.exp(x)


def exp_inv(y):
    return jnp.log(y)


def sigmoid(x):
    return nn.sigmoid(x)


def sigmoid_inv(y):
    y = jnp.asarray(y)
    return jnp.log(y) - jnp.log1p(-y)


def tril_mask(n: int):
    """Boolean lower-triangular mask (including diagonal)."""
    return jnp.tril(jnp.ones((n, n), dtype=bool))


def to_tril(raw):
    """Project a raw (…, M, M) matrix to lower-triangular (q_sqrt storage).

    The reference stores q_sqrt via the packed ``fill_triangular`` bijector
    (model_classes.py:209-219); here we keep a dense square buffer and mask,
    which keeps shapes MXU-friendly and makes vmap/sharding trivial.
    """
    return jnp.tril(raw)
