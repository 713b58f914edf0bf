"""Collapsed (Titsias) bound tests: identity with explicit-q ELBO at the
optimal q, and pipeline equivalence of the Gaussian fast path."""

import jax
import jax.numpy as jnp
import numpy as np

from waveome_tpu.fit import penalized_fit
from waveome_tpu.kernels import KernelSpec, Primitive, full_kernel_build
from waveome_tpu.models import svgp

rng = np.random.default_rng(13)


def _data(n=30):
    X = np.column_stack([
        rng.integers(0, 4, n).astype(float), rng.normal(size=n)
    ])
    Y = (np.sin(2 * X[:, 1]) + 0.3 * rng.normal(size=n))[:, None]
    return jnp.asarray(X), jnp.asarray(Y)


def test_collapsed_equals_elbo_at_optimal_q():
    X, Y = _data()
    spec = KernelSpec((
        (Primitive("categorical", 0),),
        (Primitive("squared_exponential", 1),),
    ))
    config = svgp.make_config(spec, "gaussian", num_data=X.shape[0],
                              input_dim=2)
    params = svgp.init_params(config, X)
    bound = float(svgp.collapsed_elbo(config, params, X, Y))
    q_mu, q_sqrt = svgp.optimal_q(config, params, X, Y)
    params_q = dict(params, q_mu=q_mu, q_sqrt_raw=q_sqrt)
    explicit = float(svgp.elbo(config, params_q, X, Y))
    np.testing.assert_allclose(bound, explicit, rtol=1e-8)
    # any other q is worse (it's the max)
    params_bad = dict(params, q_mu=q_mu + 0.1)
    assert float(svgp.elbo(config, params_bad, X, Y)) < bound


def test_exact_mll_equals_collapsed_at_full_inducing():
    """At Z == X frozen (M == N) the Titsias bound is tight, so
    svgp.exact_mll must equal svgp.collapsed_elbo up to jitter-level
    terms — the invariant behind the search engine's Gaussian objective
    switch (search/engine.py: one gram + one Cholesky per evaluation
    instead of two of each plus two M^2 N solves)."""
    X, Y = _data(36)
    spec = KernelSpec((
        (Primitive("categorical", 0),),
        (Primitive("squared_exponential", 1),),
    ))
    config = svgp.make_config(spec, "gaussian", num_data=X.shape[0],
                              input_dim=2,
                              num_inducing_points=X.shape[0])
    params = svgp.init_params(config, X)
    exact = float(svgp.exact_mll(config, params, X, Y))
    bound = float(svgp.collapsed_elbo(config, params, X, Y))
    np.testing.assert_allclose(exact, bound, rtol=1e-6)

    # coded-dispatch path (what search candidates evaluate)
    from waveome_tpu.kernels import ops as _ops
    from waveome_tpu.search.engine import _stack_coded

    codes = sorted({p.code for comp in spec.components for p in comp}
                   | {_ops.EMPTY})
    config_c = svgp.make_config(
        spec, "gaussian", num_data=X.shape[0], input_dim=2,
        num_inducing_points=X.shape[0], coded_structure=True,
        coded_ops=tuple(codes))
    coded = jax.tree.map(lambda a: a[0], _stack_coded([spec], 2, 2))
    exact_c = float(svgp.exact_mll(config_c, params, X, Y, coded=coded))
    bound_c = float(svgp.collapsed_elbo(config_c, params, X, Y,
                                        coded=coded))
    np.testing.assert_allclose(exact_c, exact, rtol=1e-8)
    np.testing.assert_allclose(exact_c, bound_c, rtol=1e-6)


def test_collapsed_with_sparse_inducing():
    X, Y = _data(40)
    spec = KernelSpec(((Primitive("squared_exponential", 1),),))
    config = svgp.make_config(spec, "gaussian", num_data=40, input_dim=2,
                              num_inducing_points=15)
    params = svgp.init_params(config, X)
    bound = float(svgp.collapsed_elbo(config, params, X, Y))
    q_mu, q_sqrt = svgp.optimal_q(config, params, X, Y)
    explicit = float(svgp.elbo(config, dict(params, q_mu=q_mu,
                                            q_sqrt_raw=q_sqrt), X, Y))
    np.testing.assert_allclose(bound, explicit, rtol=1e-8)


def test_pipeline_collapsed_matches_explicit():
    """The Gaussian fast path must reach (at least) the explicit path's
    objective and produce the same pruning decisions."""
    rng2 = np.random.default_rng(3)
    n_units, n_per = 12, 8
    ids = np.repeat(np.arange(n_units), n_per).astype(float)
    t = np.tile(np.linspace(-2, 2, n_per), n_units)
    female = np.repeat((np.arange(n_units) % 2).astype(float), n_per)
    X = jnp.asarray(np.column_stack([ids, t, female]))
    Y = jnp.asarray(
        (np.sin(1.5 * t) + 0.25 * rng2.normal(size=n_units * n_per))[:, None]
    )
    spec, _ = full_kernel_build(
        cat_vars=[0, 2], num_vars=[1], unit_idx=0,
        var_names=["id", "t", "sex"], return_sum=True,
    )
    config = svgp.make_config(spec, "gaussian", num_data=X.shape[0],
                              input_dim=3)
    params0 = svgp.init_params(config, X)

    res_c = penalized_fit(config, params0, X, Y, num_factor_iter=0,
                          max_iter=300, use_collapsed=True)
    res_e = penalized_fit(config, params0, X, Y, num_factor_iter=0,
                          max_iter=600, use_collapsed=False)
    np.testing.assert_allclose(np.asarray(res_c.component_mask),
                               np.asarray(res_e.component_mask))
    # collapsed objective value should beat (or match) the explicit one
    assert float(res_c.loss) <= float(res_e.loss) + 0.5
    # far fewer iterations needed
    assert int(res_c.num_iters) <= int(res_e.num_iters)
