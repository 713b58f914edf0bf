"""Unit tests for the kernel layer: primitive grams, spec machinery,
coded-vs-static dispatch, saturated builder, and PSD properties.

Golden values check the exact formulas of the reference kernels
(waveome/kernels.py and the gpflow kernels it borrows).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveome_tpu.bijectors import softplus, softplus_inv
from waveome_tpu.kernels import (
    KernelSpec,
    Primitive,
    component_variances,
    from_name,
    full_kernel_build,
    gram,
    gram_coded,
    gram_diag,
    gram_diag_coded,
    single,
)

rng = np.random.default_rng(0)


def _rand_X(n=7, d=3):
    X = rng.normal(size=(n, d))
    X[:, 0] = rng.integers(0, 3, size=n)  # categorical-ish column
    return jnp.asarray(X)


def _params_for(spec, **overrides):
    raw = np.asarray(spec.init_raw_params())
    return jnp.asarray(raw)


def test_softplus_roundtrip():
    vals = np.array([1e-3, 0.5, 1.0, 10.0, 100.0])
    np.testing.assert_allclose(
        np.asarray(softplus(softplus_inv(vals))), vals, rtol=1e-10
    )


def test_se_gram_formula():
    X = _rand_X()
    spec = single("squared_exponential", dim=1)
    raw = spec.init_raw_params()
    # set variance=2.0, lengthscale=0.7
    raw = raw.at[0, 0, 0].set(softplus_inv(2.0))
    raw = raw.at[0, 0, 1].set(softplus_inv(0.7))
    K = np.asarray(gram(spec, raw, X))
    x = np.asarray(X[:, 1])
    expected = 2.0 * np.exp(
        -0.5 * (x[:, None] - x[None, :]) ** 2 / 0.7 ** 2
    )
    np.testing.assert_allclose(K, expected, rtol=1e-8)


def test_matern12_formula():
    X = _rand_X()
    spec = single("matern12", dim=2)
    raw = spec.init_raw_params()
    K = np.asarray(gram(spec, raw, X))
    x = np.asarray(X[:, 2])
    expected = np.exp(-np.abs(x[:, None] - x[None, :]))
    np.testing.assert_allclose(K, expected, rtol=1e-8)


def test_linear_and_poly_formula():
    X = _rand_X()
    x = np.asarray(X[:, 1])
    spec = single("linear", dim=1)
    K = np.asarray(gram(spec, spec.init_raw_params(), X))
    np.testing.assert_allclose(K, x[:, None] * x[None, :], rtol=1e-8)

    spec = single("polynomial", dim=1, degree=3.0)
    K = np.asarray(gram(spec, spec.init_raw_params(), X))
    np.testing.assert_allclose(
        K, (x[:, None] * x[None, :] + 1.0) ** 3, rtol=1e-8
    )


def test_categorical_equality_kernel():
    """σ²·1[round(x)==round(x2)] — kernels.py:109-117."""
    X = _rand_X()
    spec = single("categorical", dim=0)
    K = np.asarray(gram(spec, spec.init_raw_params(), X))
    x = np.round(np.asarray(X[:, 0]))
    expected = (x[:, None] == x[None, :]).astype(float)
    np.testing.assert_allclose(K, expected)
    # diag is all variance (kernels.py:119-124)
    kd = np.asarray(gram_diag(spec, spec.init_raw_params(), X))
    np.testing.assert_allclose(kd, np.ones_like(kd))


def test_periodic_formula():
    X = _rand_X()
    spec = single("periodic", dim=1)
    raw = spec.init_raw_params()
    raw = raw.at[0, 0, 2].set(softplus_inv(1.3))  # period
    K = np.asarray(gram(spec, raw, X))
    x = np.asarray(X[:, 1])
    s = np.sin(np.pi * (x[:, None] - x[None, :]) / 1.3)
    np.testing.assert_allclose(K, np.exp(-2.0 * s ** 2), rtol=1e-8)


def test_sum_product_assembly_and_diag():
    """Sum of [cat(0), SE(1)*cat(0)] matches manual assembly."""
    X = _rand_X()
    spec = KernelSpec((
        (Primitive("categorical", 0),),
        (Primitive("categorical", 0, train_variance=False),
         Primitive("squared_exponential", 1)),
    ))
    raw = spec.init_raw_params()
    K = np.asarray(gram(spec, raw, X))
    x0 = np.round(np.asarray(X[:, 0]))
    x1 = np.asarray(X[:, 1])
    cat = (x0[:, None] == x0[None, :]).astype(float)
    se = np.exp(-0.5 * (x1[:, None] - x1[None, :]) ** 2)
    np.testing.assert_allclose(K, cat + cat * se, rtol=1e-8)
    kd = np.asarray(gram_diag(spec, raw, X))
    np.testing.assert_allclose(kd, np.diag(K), rtol=1e-8)


def test_component_mask_prunes():
    X = _rand_X()
    spec = KernelSpec((
        (Primitive("categorical", 0),),
        (Primitive("squared_exponential", 1),),
    ))
    raw = spec.init_raw_params()
    mask = jnp.array([0.0, 1.0])
    K = np.asarray(gram(spec, raw, X, component_mask=mask))
    only_se = np.asarray(gram(single("squared_exponential", 1),
                              single("squared_exponential", 1).init_raw_params(),
                              X))
    np.testing.assert_allclose(K, only_se, rtol=1e-8)


def test_coded_matches_static():
    X = _rand_X(9, 4)
    spec = KernelSpec((
        (Primitive("categorical", 0),),
        (Primitive("squared_exponential", 1),),
        (Primitive("categorical", 0, train_variance=False),
         Primitive("matern12", 2)),
        (Primitive("linear", 3),),
    ))
    raw = spec.init_raw_params() + 0.3 * jnp.asarray(
        rng.normal(size=spec.init_raw_params().shape)
    )
    coded = spec.coded()
    K_static = np.asarray(gram(spec, raw, X))
    K_coded = np.asarray(gram_coded(coded, raw, X))
    np.testing.assert_allclose(K_coded, K_static, rtol=1e-8)
    d_static = np.asarray(gram_diag(spec, raw, X))
    d_coded = np.asarray(gram_diag_coded(coded, raw, X))
    np.testing.assert_allclose(d_coded, d_static, rtol=1e-8)


def test_coded_matches_static_all_ops_and_orders():
    """Coded dispatch == static dispatch for EVERY op, including every
    arccosine order (0/1/2) — non-default orders ride an "orders" array
    in the coded dict (VERDICT r3: order was silently pinned to 1)."""
    X = _rand_X(9, 4)
    cases = [("squared_exponential", 1, {}), ("matern12", 1, {}),
             ("matern32", 2, {}), ("matern52", 2, {}),
             ("linear", 3, {}), ("periodic", 1, {}),
             ("categorical", 0, {}), ("polynomial", 1, {"degree": 2.0}),
             ("rational_quadratic", 2, {}), ("constant", 0, {}),
             ("arccosine", 1, {"order": 0}),
             ("arccosine", 1, {"order": 1}),
             ("arccosine", 2, {"order": 2})]
    for op, dim, kw in cases:
        spec = KernelSpec(((Primitive(op, dim, **kw),),))
        raw = spec.init_raw_params() + 0.2 * jnp.asarray(
            rng.normal(size=spec.init_raw_params().shape))
        coded = spec.coded()
        if kw.get("order", 1) != 1:
            assert "orders" in coded, f"{op} order not exported"
        else:
            # default order keeps the original operand set so existing
            # compiled search programs stay cache-valid
            assert "orders" not in coded
        K_static = np.asarray(gram(spec, raw, X))
        K_coded = np.asarray(gram_coded(coded, raw, X))
        np.testing.assert_allclose(
            K_coded, K_static, rtol=1e-8,
            err_msg=f"coded gram mismatch for {op} {kw}")
        d_static = np.asarray(gram_diag(spec, raw, X))
        d_coded = np.asarray(gram_diag_coded(coded, raw, X))
        np.testing.assert_allclose(
            d_coded, d_static, rtol=1e-8,
            err_msg=f"coded diag mismatch for {op} {kw}")


def test_grams_are_psd():
    X = _rand_X(12, 3)
    for op, dim in [("squared_exponential", 1), ("matern12", 1),
                    ("matern32", 2), ("matern52", 2), ("linear", 1),
                    ("periodic", 1), ("categorical", 0), ("arccosine", 1),
                    ("rational_quadratic", 2), ("polynomial", 1)]:
        spec = single(op, dim=dim)
        K = np.asarray(gram(spec, spec.init_raw_params(), X))
        eigs = np.linalg.eigvalsh(K + 1e-8 * np.eye(K.shape[0]))
        assert eigs.min() > -1e-6, f"{op} gram not PSD"
        np.testing.assert_allclose(K, K.T, rtol=1e-8)


def test_full_kernel_build_structure_and_names():
    """Mirror regularization.py:14-189 for the tutorial design:
    X columns = [id, time, female], unit=0, cat=[2], num=[1]."""
    spec, names = full_kernel_build(
        cat_vars=[0, 2], num_vars=[1], unit_idx=0,
        var_names=["id", "time", "female"], return_sum=True,
    )
    assert names == [
        "categorical[id]",
        "categorical[female]",
        "squared_exponential[time]",
        "categorical[female]*squared_exponential[time]",
    ]
    assert spec.num_components == 4
    # interaction categorical variance frozen (regularization.py:132)
    assert spec.components[3][0].train_variance is False
    # canonical names use dim indices
    assert spec.component_names()[0] == "categorical[0]"


def test_full_kernel_build_lmc_rank_replication():
    kernels, names = full_kernel_build(
        cat_vars=[0], num_vars=[1], unit_idx=None,
        var_names=["g", "t"], return_sum=False, ranks=2,
    )
    assert len(kernels) == 2 * 2 + 2  # cat + SE replicated + interactions
    assert names[0] == "categorical[g]_0"
    assert all(isinstance(k, KernelSpec) for k in kernels)


def test_component_variances_product_semantics():
    """find_variance_components parity (utilities.py:1012-1062): products
    multiply factor variances, frozen factors contribute their value."""
    spec = KernelSpec((
        (Primitive("categorical", 0),),
        (Primitive("categorical", 0, train_variance=False),
         Primitive("squared_exponential", 1)),
    ))
    raw = spec.init_raw_params()
    raw = raw.at[0, 0, 0].set(softplus_inv(2.5))
    raw = raw.at[1, 1, 0].set(softplus_inv(0.3))
    v = np.asarray(component_variances(spec, raw))
    np.testing.assert_allclose(v, [2.5, 1.0 * 0.3], rtol=1e-7)


def test_name_roundtrip_and_padding():
    spec = KernelSpec((
        (Primitive("categorical", 0),),
        (Primitive("squared_exponential", 1),
         Primitive("categorical", 2, train_variance=False)),
    ))
    name = spec.name()
    assert name == "categorical[0]+categorical[2]*squared_exponential[1]"
    spec2 = from_name(name)
    assert spec2.canonical_name() == spec.canonical_name()
    padded = spec.padded(num_components=5, max_factors=3)
    assert padded.num_components == 5 and padded.max_factors == 3
    # padding must not change the gram
    X = _rand_X()
    K1 = np.asarray(gram(spec, spec.init_raw_params(), X))
    K2 = np.asarray(gram(padded, padded.init_raw_params(), X))
    np.testing.assert_allclose(K1, K2, rtol=1e-8)


def test_vmap_over_coded_structures():
    """A batch of different structures evaluates in ONE vmapped call —
    the core trick replacing per-candidate Ray fits."""
    X = _rand_X(6, 3)
    s1 = single("squared_exponential", 1).padded(2, 2)
    s2 = single("matern12", 2).padded(2, 2)
    s3 = KernelSpec((
        (Primitive("categorical", 0),),
        (Primitive("linear", 1),),
    )).padded(2, 2)
    specs = [s1, s2, s3]
    coded = jax.tree.map(lambda *xs: jnp.stack(xs), *[s.coded() for s in specs])
    raws = jnp.stack([s.init_raw_params() for s in specs])
    Ks = jax.vmap(lambda c, r: gram_coded(c, r, X))(coded, raws)
    for i, s in enumerate(specs):
        np.testing.assert_allclose(
            np.asarray(Ks[i]),
            np.asarray(gram(s, s.init_raw_params(), X)),
            rtol=1e-8,
        )


def test_from_name_rank_suffix():
    """Rank-replicated names (regularization.py:65-70 style '_r' suffixes)
    parse: suffix is display-only and is dropped."""
    spec = from_name("categorical[0]_1+squared_exponential[2]_0*categorical[1]")
    assert spec.num_components == 2
    assert spec.components[0][0].op == "categorical"
    assert spec.components[0][0].dim == 0
    assert spec.components[1][0].op == "squared_exponential"
    assert spec.components[1][0].dim == 2

    import pytest as _pytest

    with _pytest.raises(ValueError):
        from_name("categorical[id]")  # display names aren't parseable
