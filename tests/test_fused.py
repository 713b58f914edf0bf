"""Fused banked gram (kernels/fused.py) equivalence vs the switch-dispatch
coded gram — the oracle for the search hot path's MXU-routed rewrite.

The fused path computes the identical sum-of-products kernels
(waveome/kernels.py + gpflow Sum/Product semantics) via exp(Σ exponents)
instead of Π exp(exponent); equality is exact math, tolerance covers fp
reassociation only.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveome_tpu.kernels import fused, ops
from waveome_tpu.kernels.gram import gram_coded, gram_diag_coded
from waveome_tpu.kernels.spec import KernelSpec, Primitive


def _rand_X(key, n=23, d=4):
    kc, kn = jax.random.split(key)
    X = jax.random.normal(kn, (n, d))
    # dim 0 categorical codes
    X = X.at[:, 0].set(
        jax.random.randint(kc, (n,), 0, 4).astype(X.dtype))
    return X


SPECS = {
    "se": KernelSpec(((Primitive("squared_exponential", 1),),)),
    "sum": KernelSpec((
        (Primitive("categorical", 0),),
        (Primitive("squared_exponential", 1),),
        (Primitive("linear", 2),),
    )),
    "product": KernelSpec((
        (Primitive("categorical", 0), Primitive("matern12", 1)),
        (Primitive("matern32", 2), Primitive("linear", 3)),
    )),
    "periodic": KernelSpec((
        (Primitive("periodic", 1),),
        (Primitive("categorical", 0), Primitive("periodic", 3)),
    )),
    "zoo": KernelSpec((
        (Primitive("matern52", 1), Primitive("categorical", 0)),
        (Primitive("polynomial", 2, degree=2.0),),
        (Primitive("rational_quadratic", 3),),
        (Primitive("arccosine", 1),),
        (Primitive("constant", 0, variance_init=1e-6,
                   train_variance=False),),
    )),
}


def _fused_bits(spec, C=None, F=None):
    C = C or spec.num_components
    F = F or max(spec.max_factors, 2)
    layout, cl_keys, routing = fused.build_layout([spec], n_dims=4,
                                                  C=C, F=F)
    coded = spec.padded(C, F).coded()
    coded.update({k: jnp.asarray(v[0]) for k, v in routing.items()})
    return layout, cl_keys, coded, (C, F)


@pytest.mark.parametrize("name", sorted(SPECS))
def test_fused_matches_coded(name):
    spec = SPECS[name]
    key = jax.random.PRNGKey(hash(name) % (2**31))
    X = _rand_X(key)
    layout, cl_keys, coded, (C, F) = _fused_bits(spec)
    banks = fused.build_banks(layout, cl_keys, X)
    raw = spec.padded(C, F).init_raw_params() + 0.3 * jax.random.normal(
        key, (C, F, ops.N_PARAM_SLOTS))

    K_ref = gram_coded(coded, raw, X, X)
    K_fused = fused.gram_coded_fused(layout, coded, raw, banks)
    np.testing.assert_allclose(np.asarray(K_fused), np.asarray(K_ref),
                               rtol=1e-9, atol=1e-11)

    d_ref = gram_diag_coded(coded, raw, X)
    d_fused = fused.gram_diag_coded_fused(layout, coded, raw, banks)
    np.testing.assert_allclose(np.asarray(d_fused), np.asarray(d_ref),
                               rtol=1e-9, atol=1e-11)


def test_fused_component_mask():
    spec = SPECS["sum"]
    key = jax.random.PRNGKey(7)
    X = _rand_X(key)
    layout, cl_keys, coded, (C, F) = _fused_bits(spec)
    banks = fused.build_banks(layout, cl_keys, X)
    raw = spec.padded(C, F).init_raw_params()
    mask = jnp.asarray([1.0, 0.0, 1.0])
    K_ref = gram_coded(coded, raw, X, X, component_mask=mask)
    K_fused = fused.gram_coded_fused(layout, coded, raw, banks,
                                     component_mask=mask)
    np.testing.assert_allclose(np.asarray(K_fused), np.asarray(K_ref),
                               rtol=1e-9, atol=1e-12)


def test_fused_batched_vmap_and_grad():
    """The production composition: vmap over candidates with shared banks,
    padded shapes, gradients through the fused gram."""
    specs = [SPECS["sum"], SPECS["product"], SPECS["periodic"]]
    C = max(s.num_components for s in specs)
    F = max(max(s.max_factors for s in specs), 2)
    layout, cl_keys, routing = fused.build_layout(specs, n_dims=4,
                                                  C=C, F=F)
    key = jax.random.PRNGKey(11)
    X = _rand_X(key)
    banks = fused.build_banks(layout, cl_keys, X)

    codeds = []
    for i, s in enumerate(specs):
        c = s.padded(C, F).coded()
        c.update({k: jnp.asarray(v[i]) for k, v in routing.items()})
        codeds.append(c)
    coded_b = jax.tree.map(lambda *xs: jnp.stack(xs), *codeds)
    raw_b = jnp.stack([
        s.padded(C, F).init_raw_params() + 0.1 * i
        for i, s in enumerate(specs)
    ])

    def loss(raw_i, coded_i):
        K = fused.gram_coded_fused(layout, coded_i, raw_i, banks)
        return jnp.sum(K * K)

    vals, grads = jax.vmap(jax.value_and_grad(loss))(raw_b, coded_b)
    for i, s in enumerate(specs):
        K_ref = gram_coded(codeds[i], raw_b[i], X, X)
        np.testing.assert_allclose(float(vals[i]),
                                   float(jnp.sum(K_ref * K_ref)),
                                   rtol=1e-9)
    assert np.isfinite(np.asarray(grads)).all()


def test_supported_gate():
    assert fused.supported(list(SPECS.values()))
    bad = KernelSpec(((Primitive("arccosine", 1, order=2),),))
    assert not fused.supported([bad])
