"""Pallas fused gram kernel vs reference gram (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from waveome_tpu.kernels import KernelSpec, Primitive, gram
from waveome_tpu.pallas_ops import gram_pallas

rng = np.random.default_rng(11)


def _spec():
    return KernelSpec((
        (Primitive("categorical", 0),),
        (Primitive("squared_exponential", 1),),
        (Primitive("categorical", 0, train_variance=False),
         Primitive("matern12", 1)),
        (Primitive("linear", 2),),
        (Primitive("periodic", 1),),
    ))


def test_pallas_gram_matches_reference():
    spec = _spec()
    X1 = jnp.asarray(np.column_stack([
        rng.integers(0, 5, 40).astype(float),
        rng.normal(size=40),
        rng.normal(size=40),
    ]), dtype=jnp.float32)
    X2 = jnp.asarray(np.column_stack([
        rng.integers(0, 5, 23).astype(float),
        rng.normal(size=23),
        rng.normal(size=23),
    ]), dtype=jnp.float32)
    raw = spec.init_raw_params(dtype=jnp.float32)
    raw = raw + 0.1 * jnp.asarray(
        rng.normal(size=raw.shape), dtype=jnp.float32
    )
    K_ref = np.asarray(gram(spec, raw, X1, X2))
    K_pal = np.asarray(gram_pallas(spec, raw, X1, X2, interpret=True))
    assert K_pal.shape == K_ref.shape
    np.testing.assert_allclose(K_pal, K_ref, rtol=2e-5, atol=2e-6)


def test_pallas_gram_component_mask():
    spec = _spec()
    X = jnp.asarray(np.column_stack([
        rng.integers(0, 3, 17).astype(float),
        rng.normal(size=17),
        rng.normal(size=17),
    ]), dtype=jnp.float32)
    raw = spec.init_raw_params(dtype=jnp.float32)
    mask = jnp.asarray([1.0, 0.0, 1.0, 0.0, 1.0], dtype=jnp.float32)
    K_ref = np.asarray(gram(spec, raw, X, component_mask=mask))
    K_pal = np.asarray(
        gram_pallas(spec, raw, X, component_mask=mask, interpret=True)
    )
    np.testing.assert_allclose(K_pal, K_ref, rtol=2e-5, atol=2e-6)
