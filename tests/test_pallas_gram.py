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


def test_analytic_backward_matches_jax_vjp():
    """gram_vjp_analytic (the fused gram's hand-derived backward) is exact
    vs jax.vjp of the XLA gram, for every supported op, with and without a
    component mask."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from waveome_tpu.kernels.build import full_kernel_build
    from waveome_tpu.kernels.gram import gram_xla
    from waveome_tpu.kernels.spec import KernelSpec, Primitive
    from waveome_tpu.pallas_ops.gram_pallas import gram_vjp_analytic

    rng = np.random.default_rng(0)
    sat, _ = full_kernel_build(
        cat_vars=[0, 2], num_vars=[1], unit_idx=0,
        var_names=["id", "t", "f"], return_sum=True,
        kerns=["squared_exponential", "matern12", "linear", "periodic"],
    )
    mixed = KernelSpec((
        (Primitive("matern32", 0), Primitive("rational_quadratic", 1)),
        (Primitive("polynomial", 1),),
        (Primitive("matern52", 0), Primitive("constant", 0)),
    ))
    X1 = jnp.asarray(np.column_stack([
        rng.integers(0, 5, 20), rng.normal(size=20),
        rng.integers(0, 2, 20)]).astype(float))
    X2 = jnp.asarray(np.column_stack([
        rng.integers(0, 5, 16), rng.normal(size=16),
        rng.integers(0, 2, 16)]).astype(float))
    cot = jnp.asarray(rng.normal(size=(20, 16)))
    for spec in (sat, mixed):
        sp = spec.padded()
        raw = jnp.asarray(
            rng.normal(size=np.asarray(sp.init_raw_params()).shape))
        for cm in (None,
                   jnp.asarray(rng.uniform(0.2, 1, sp.num_components))):
            _, vjp = jax.vjp(
                lambda r, m: gram_xla(spec, r, X1, X2, m), raw, cm)
            want_r, want_m = vjp(cot)
            got_r, got_m = gram_vjp_analytic(spec, raw, X1, X2, cm, cot)
            np.testing.assert_allclose(np.asarray(got_r),
                                       np.asarray(want_r),
                                       rtol=1e-6, atol=1e-8)
            if cm is not None:
                np.testing.assert_allclose(np.asarray(got_m),
                                           np.asarray(want_m),
                                           rtol=1e-6, atol=1e-8)


def test_forward_pallas_trials_in_plbfgs():
    """plbfgs with trial_loss_fn=forward_pallas(loss) (the chip trial
    dispatch, interpret-mode here) reaches the same optimum as the plain
    XLA run — the gram is elementwise, so trial values are identical and
    the trajectories coincide."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from waveome_tpu.kernels import gram as _  # noqa: F401
    import importlib

    G = importlib.import_module("waveome_tpu.kernels.gram")
    from waveome_tpu.kernels.build import full_kernel_build
    from waveome_tpu.models import svgp
    from waveome_tpu.optimize.plbfgs import plbfgs_fit

    old_off = G._PALLAS_FORWARD_OFF
    G._PALLAS_FORWARD_OFF = False
    # force eligibility on CPU via interpret-mode pallas
    old_min = G._PALLAS_MIN_N
    G._PALLAS_MIN_N = 8
    try:
        rng = np.random.default_rng(0)
        N = 40
        X = jnp.asarray(np.column_stack([
            np.repeat(np.arange(8), 5), np.tile(np.linspace(-2, 2, 5), 8),
        ]), dtype=jnp.float32)
        y = jnp.asarray(
            np.sin(1.5 * np.asarray(X[:, 1])) + 0.1 * rng.normal(size=N),
            dtype=jnp.float32)[:, None]
        spec, _names = full_kernel_build(
            cat_vars=[0], num_vars=[1], unit_idx=0,
            var_names=["id", "t"], return_sum=True)
        config = svgp.make_config(spec, "gaussian", num_data=N,
                                  input_dim=2, num_inducing_points=N)
        p0 = svgp.init_params(config, X, dtype=jnp.float32)
        mask = jax.tree.map(np.asarray, svgp.train_mask(config, p0))
        for k in ("q_mu", "q_sqrt_raw", "z"):
            mask[k] = np.zeros_like(mask[k])

        def loss(p):
            return -svgp.exact_mll(config, p, X, y)

        # pallas path must actually be eligible on the CPU-interpret road:
        # only check the backend gate is the difference
        res_plain = plbfgs_fit(loss, p0, mask=mask, max_iter=12, tol=1e-5)
        res_trial = plbfgs_fit(loss, p0, mask=mask, max_iter=12, tol=1e-5,
                               trial_loss_fn=G.forward_pallas(loss))
        assert np.isfinite(float(res_trial.loss))
        np.testing.assert_allclose(float(res_trial.loss),
                                   float(res_plain.loss), rtol=1e-4)
    finally:
        G._PALLAS_FORWARD_OFF = old_off
        G._PALLAS_MIN_N = old_min
