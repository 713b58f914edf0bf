"""Coverage for remaining paths: GPSearch multioutput, split/softmax
search, plotting on coded (search) models, component conditional mode,
bhattacharyya and legacy attribution helpers."""

import numpy as np
import pandas as pd

import jax.numpy as jnp

from waveome_tpu.interpret.components import individual_kernel_predictions
from waveome_tpu.interpret.metrics import calc_bhattacharyya_dist
from waveome_tpu.kernels import KernelSpec, Primitive
from waveome_tpu.models import svgp
from waveome_tpu.search import split_kernel_search
from waveome_tpu.search.softmax import softmax_kernel_selection
from waveome_tpu.utilities import (
    print_kernel_names,
    variance_contributions,
    variance_contributions_diag,
)


def _design(n_units=8, n_per=6, seed=0):
    rng = np.random.default_rng(seed)
    ids = np.repeat(np.arange(n_units), n_per).astype(float)
    t = np.tile(np.linspace(-2, 2, n_per), n_units)
    return np.column_stack([ids, t]), t, rng


def test_gpsearch_multioutput_and_latent_plots():
    X, t, rng = _design()
    n = X.shape[0]
    g1 = np.sin(1.5 * t)
    W = rng.normal(size=(3, 1))
    Y = g1[:, None] @ W.T + 0.2 * rng.normal(size=(n, 3))
    from waveome_tpu import GPSearch

    gps = GPSearch(
        X=pd.DataFrame({"id": X[:, 0], "t": X[:, 1]}),
        Y=pd.DataFrame({f"y{i}": Y[:, i] for i in range(3)}),
        unit_col="id",
    )
    res = gps.multioutput_penalized_optimization(
        kernel_options={"ranks": 2},
        sparse_options={"num_inducing_points": 16},
        num_opt_iter=200, random_seed=0,
    )
    assert res.config.num_outputs == 3
    fig, _ = gps.plot_latent_processes(x_axis_label="t")
    assert fig is not None
    fig, _ = gps.plot_multioutput_predictions(x_axis_label="t")
    assert fig is not None


def test_split_kernel_search_unit_holdout():
    X, t, rng = _design(seed=1)
    Y = (np.sin(1.8 * t) + 0.2 * rng.normal(size=X.shape[0]))[:, None]
    res = split_kernel_search(
        X, Y, kern_list=["squared_exponential"], unit_idx=0, cat_vars=[0],
        max_depth=2, num_restart=1, max_iter=150, random_seed=0,
    )
    assert "squared_exponential[1]" in res["best_model_name"]


def test_softmax_selection_prefers_low_bic():
    rng = np.random.default_rng(0)
    picks = [
        softmax_kernel_selection([10.0, 50.0, 100.0], ["a", "b", "c"], rng)
        for _ in range(50)
    ]
    assert picks.count("a") > picks.count("c")


def test_plot_parts_on_search_model():
    X, t, rng = _design(seed=2)
    Y = (np.sin(1.8 * t) + 0.2 * rng.normal(size=X.shape[0]))[:, None]
    from waveome_tpu.search import full_kernel_search
    from waveome_tpu.plots import pred_kernel_parts

    res = full_kernel_search(
        X, Y, kern_list=["squared_exponential"], cat_vars=[0],
        max_depth=2, num_restart=1, max_iter=150, random_seed=0,
    )
    model = res["best_model"]
    fig, _ = pred_kernel_parts(model, data=(X, Y), x_idx=1,
                               col_names=["id", "t"])
    assert fig is not None


def test_component_conditional_mode():
    X, t, rng = _design(seed=3)
    Y = (np.sin(1.5 * t) + 0.2 * rng.normal(size=X.shape[0]))[:, None]
    spec = KernelSpec((
        (Primitive("categorical", 0),),
        (Primitive("squared_exponential", 1),),
    ))
    config = svgp.make_config(spec, "gaussian", num_data=X.shape[0],
                              input_dim=2)
    params = svgp.init_params(config, jnp.asarray(X))
    q_mu, q_sqrt = svgp.optimal_q(config, params, jnp.asarray(X),
                                  jnp.asarray(Y))
    params = dict(params, q_mu=q_mu, q_sqrt_raw=q_sqrt)
    grid = np.zeros((20, 2))
    grid[:, 1] = np.linspace(-2, 2, 20)
    mu_m, var_m, s_m, _ = individual_kernel_predictions(
        config, params, 1, X=jnp.asarray(grid), marginal=True,
    )
    mu_c, var_c, s_c, _ = individual_kernel_predictions(
        config, params, 1, X=jnp.asarray(grid), marginal=False,
    )
    assert np.isfinite(np.asarray(mu_m)).all()
    assert np.isfinite(np.asarray(mu_c)).all()
    assert np.asarray(var_m).min() >= 0 and np.asarray(var_c).min() >= -1e-6
    # note: the conditional mode conditions on (Z, q_mu) pseudo-data like
    # the reference (utilities.py:767-769) — with whitened q these are not
    # function values, so the two modes agree only loosely; the marginal
    # mode is the default (utilities.py:827).
    assert np.asarray(s_m).shape == (20, 100)
    assert np.asarray(s_c).shape == (20, 100)
    # predict_type="mean" transform
    mu_t, var_t, s_t, cov_t = individual_kernel_predictions(
        config, params, 1, X=jnp.asarray(grid), marginal=True,
        predict_type="mean",
    )
    assert cov_t is None


def test_bhattacharyya_and_legacy_attribution():
    d = float(calc_bhattacharyya_dist(
        jnp.zeros(3), jnp.eye(3), jnp.zeros(3), jnp.eye(3)
    ))
    assert abs(d) < 1e-10
    d2 = float(calc_bhattacharyya_dist(
        jnp.zeros(3), jnp.eye(3), jnp.ones(3), 2.0 * jnp.eye(3)
    ))
    assert d2 > 0

    spec = KernelSpec((
        (Primitive("categorical", 0),),
        (Primitive("squared_exponential", 1),),
    ))
    raw = spec.init_raw_params()
    vc = variance_contributions(spec, raw, lik_variance=0.5)
    assert vc == [1.0, 1.0, 0.5]
    X = np.column_stack([np.arange(6.0) % 2, np.linspace(0, 1, 6)])
    vcd = variance_contributions_diag(spec, raw, X, lik_variance=0.5)
    assert len(vcd) == 3

    assert print_kernel_names(spec) == [
        "categorical[0]", "squared_exponential[1]"
    ]
    assert print_kernel_names(KernelSpec(
        ((Primitive("linear", 0),),)
    )) == "linear[0]"


def test_importance_return_values_consistent():
    """All three importance scales (log_bf / statistic / deviance) on one
    fitted model, built from POINTWISE log-lik differences: statistic =
    2*log_bf, deviance in [0,1] with the reference's semantics
    (utilities.py:676-693: 1 = removing the component changes nothing)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from waveome_tpu.fit import fit_outcomes_penalized
    from waveome_tpu.interpret.importance import feature_importance
    from waveome_tpu.kernels import full_kernel_build

    rng = np.random.default_rng(2)
    ids = np.repeat(np.arange(8), 6).astype(float)
    t = np.tile(np.linspace(-2, 2, 6), 8)
    X = np.column_stack([ids, t])
    y = np.sin(1.6 * t) + 0.15 * rng.normal(size=t.size)
    spec, _ = full_kernel_build(cat_vars=[0], num_vars=[1], unit_idx=0,
                                var_names=["id", "t"], return_sum=True)
    res = fit_outcomes_penalized(
        X, y[:, None], spec, likelihood="gaussian",
        num_inducing_points=X.shape[0], penalization_factor=1.0,
        num_factor_iter=0, max_iter=150, use_mesh=False,
        compute_importances=False,
    )
    params = jax.tree.map(lambda a: jnp.asarray(a[0]), res.results.params)
    config = res.config
    Xj, yj = jnp.asarray(X), jnp.asarray(y)

    lbf = np.asarray(feature_importance(config, params, Xj, yj,
                                        return_value="log_bf"))
    st = np.asarray(feature_importance(config, params, Xj, yj,
                                       return_value="statistic"))
    de = np.asarray(feature_importance(config, params, Xj, yj,
                                       return_value="deviance"))
    C = config.num_components
    # statistic = 2 * log_bf (clipped at 0), same residual share
    np.testing.assert_allclose(st[:C], np.maximum(2 * lbf[:C], 0.0),
                               atol=0.21)
    np.testing.assert_allclose(st[-1], lbf[-1])
    assert ((de[:C] >= 0) & (de[:C] <= 1)).all()
    # the SE-on-time component carries the signal: removing it must cost
    # log-lik (positive log BF) and drive its deviance value DOWN
    i_sig = 1  # component order: categorical[id], se[t]
    assert lbf[i_sig] > 1.0
    assert de[i_sig] < 0.9
