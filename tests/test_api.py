"""End-to-end GPSearch API tests mirroring the overview tutorial
(waveome_overview.ipynb): 3 outcomes with known structure, penalized
optimization, kernel names, importances, heatmap frame, and plots."""

import numpy as np
import pandas as pd
import pytest

from waveome_tpu import GPSearch


@pytest.fixture(scope="module")
def tutorial_data():
    rng = np.random.default_rng(7)
    n_units, n_per = 12, 8
    ids = np.repeat([f"s{i}" for i in range(n_units)], n_per)
    t = np.tile(np.linspace(0, 10, n_per), n_units)
    female = np.repeat((np.arange(n_units) % 2).astype(float), n_per)
    n = n_units * n_per
    X = pd.DataFrame({"id": ids, "time": t, "female": female})
    Y = pd.DataFrame({
        "y_sin": np.sin(t) + 0.25 * rng.normal(size=n),
        "y_gender": female * np.cos(t) + 0.25 * rng.normal(size=n),
        "y_linear": 0.3 * t
        + rng.normal(size=n_units)[np.repeat(np.arange(n_units), n_per)]
        + 0.25 * rng.normal(size=n),
    })
    return X, Y


@pytest.fixture(scope="module")
def fitted_gps(tutorial_data):
    X, Y = tutorial_data
    gps = GPSearch(
        X=X, Y=Y, unit_col="id", categorical_vars=["female"],
        outcome_likelihood="gaussian", Y_transform="standardize",
    )
    gps.penalized_optimization(
        penalization_factor=None, num_factor_iter=2,
        optimization_options={"num_opt_iter": 300},
    )
    return gps


def test_ingestion(tutorial_data):
    X, Y = tutorial_data
    gps = GPSearch(X=X, Y=Y, unit_col="id", categorical_vars=["female"])
    # string unit factorized + mapping retained (model_search.py:96-104)
    assert "id" in gps.categorical_dict
    assert gps.unit_idx == 0
    assert gps.cat_idx == [2, 0]  # female, id
    assert gps.cont_idx == [1]
    # continuous standardized
    assert abs(gps.X["time"].mean()) < 1e-10


def test_ingestion_errors(tutorial_data):
    X, Y = tutorial_data
    with pytest.raises(TypeError):
        GPSearch(X=X.to_numpy(), Y=Y)
    Xbad = X.copy()
    Xbad.loc[0, "time"] = np.nan
    with pytest.raises(AssertionError):
        GPSearch(X=Xbad.astype({"id": "str"}), Y=Y, unit_col="id")


def test_penalized_models_and_names(fitted_gps):
    gps = fitted_gps
    assert set(gps.models) == {"y_sin", "y_gender", "y_linear"}
    m_sin = gps.models["y_sin"]
    assert "squared_exponential[1]" in m_sin.kernel_name
    m_gender = gps.models["y_gender"]
    assert "*" in m_gender.kernel_name, m_gender.kernel_name
    m_lin = gps.models["y_linear"]
    assert "categorical[0]" in m_lin.kernel_name

    # importances sum structure: active comps + residual
    imps = m_sin.feature_importances
    assert len(imps) == len(m_sin.active_components) + 1

    # predictions work through the pruned-mask path
    ymu, yvar = m_sin.predict_y(gps.X.to_numpy())
    assert np.all(np.isfinite(np.asarray(ymu)))
    bic = m_sin.calc_metric(gps.X.to_numpy(),
                            gps.Y["y_sin"].to_numpy()[:, None])
    assert np.isfinite(bic)


def test_importance_frame_and_heatmap(fitted_gps):
    gps = fitted_gps
    df = gps.importance_frame()
    assert set(df.index) == {"y_sin", "y_gender", "y_linear"}
    assert "residual" in df.columns
    # column names rewritten to variable names (utilities.py:266-278)
    assert any("time" in c for c in df.columns)
    g = gps.plot_heatmap(var_cutoff=0.0)
    assert g is not None
    # reference filtering semantics (model_search.py:1299-1347):
    # metric_cutoff on the best component, feature_name subsetting
    g = gps.plot_heatmap(var_cutoff=0.0, metric_cutoff=0.01,
                         feature_name="time")
    assert g is not None
    # an unpassable cutoff trips the reference's own assert
    with pytest.raises(AssertionError, match="Not enough models"):
        gps.plot_heatmap(var_cutoff=2.0)

    # degenerate axes must not crash clustering: a single surviving
    # component column (2 outcomes x 1 feature) used to hand scipy's
    # linkage an empty distance matrix on the transposed row axis
    import pandas as pd

    from waveome_tpu.plots import plot_heatmap

    tiny = pd.DataFrame(
        {"squared_exponential[time]": [0.7, 0.4], "residual": [0.3, 0.6]},
        index=["out_a", "out_b"],
    )
    g = plot_heatmap(tiny, var_cutoff=0.0)
    assert g is not None

    fig, ax = gps.plot_feature_metrics("time")
    assert fig is not None

    # reference semantics (model_search.py:1512-1596): per-outcome MAX
    # over the feature's components, residual-based filter, top_n head
    mdf = gps.plot_feature_metrics("time", return_df=True,
                                   min_total_explained=0.0)
    assert list(mdf.columns) == ["name", "metric"]
    assert (mdf["metric"].values[:-1] >= mdf["metric"].values[1:]).all()
    top = gps.plot_feature_metrics("time", return_df=True, top_n=1,
                                   min_total_explained=0.0)
    assert len(top) <= 1
    # a filter no outcome passes → empty frame, and the figure path
    # must still render (the reference barplots an empty frame)
    empty = gps.plot_feature_metrics("time", return_df=True,
                                     min_total_explained=2.0)
    assert len(empty) == 0


def test_plot_parts_and_marginal(fitted_gps):
    gps = fitted_gps
    fig, axes = gps.plot_parts("y_sin", x_axis_label="time")
    assert fig is not None
    fig, ax = gps.plot_marginal("y_gender", "time")
    assert fig is not None
    # notebook surface: caller-provided axes, point suppression,
    # standardized-axes mode (model_search.py:1598-1608)
    import matplotlib.pyplot as plt

    fig2, ax2 = plt.subplots()
    fig_out, ax_out = gps.plot_marginal(
        "y_gender", "time", ax=ax2, plot_points=False,
        reverse_transform_axes=False)
    assert ax_out is ax2 and fig_out is fig2
    # notebook portability: the reference's pred_kernel_parts swallows
    # gp_predict_fun-only options like unit_label via **kwargs
    # (predictions.py:43; the Sleeve notebook passes it) — we accept
    # them with a warning instead of a TypeError
    with pytest.warns(UserWarning, match="unsupported plot option"):
        fig, axes = gps.plot_parts("y_sin", x_axis_label="time",
                                   unit_label=0)
    assert fig is not None


def test_reverse_transform(fitted_gps):
    gps = fitted_gps
    v = gps.reverse_transform(np.array([0.0]), y_col="y_sin")
    np.testing.assert_allclose(
        v, gps.Y_means["y_sin"], rtol=1e-6
    )


def test_plot_marginal_all_modes(fitted_gps):
    """gp_predict_fun parity modes (predictions.py:519-729): posterior
    sample curves (num_funs), obs-scale CI via predict_y moments, func
    (latent) mode, and the per-unit conditional curve family."""
    gps = fitted_gps
    # mean mode with posterior samples
    fig, ax = gps.plot_marginal("y_sin", "time", num_funs=5)
    # sampled curves + mean line present
    assert len(ax.lines) >= 6
    # obs mode
    fig, ax = gps.plot_marginal("y_sin", "time", predict_type="obs",
                                num_funs=0)
    assert len(ax.lines) >= 1
    # func mode + all-unit curve family
    fig, ax = gps.plot_marginal("y_sin", "time", predict_type="func",
                                num_funs=0, plot_all_units=True)
    n_units = gps.X["id"].nunique()
    assert len(ax.lines) >= n_units


def test_penalized_optimization_sweep_mode(tutorial_data, tmp_path):
    """sweep_options= routes through the checkpointed chunked sweep and
    still yields predict-capable FittedGP handles; a second call
    rehydrates from the checkpoint without refitting."""
    X_df, Y_df = tutorial_data
    from waveome_tpu import GPSearch

    ck = str(tmp_path / "sweep_ck")

    def build():
        gps = GPSearch(X=X_df, Y=Y_df, unit_col="id",
                       categorical_vars=["female"],
                       Y_transform="standardize")
        gps.penalized_optimization(
            penalization_factor=1.0, num_factor_iter=0,
            optimization_options={"num_opt_iter": 120},
            sweep_options={"checkpoint_dir": ck, "chunk_size": 2},
            random_seed=0,
        )
        return gps

    gps1 = build()
    assert set(gps1.models) == set(Y_df.columns)
    mu, var = gps1.models[Y_df.columns[0]].predict_y(gps1.X.to_numpy())
    assert np.isfinite(np.asarray(mu)).all()

    gps2 = build()  # rehydrates — same masks/importances
    for c in Y_df.columns:
        np.testing.assert_allclose(gps2.models[c].raw_importances,
                                   gps1.models[c].raw_importances)
        assert gps2.models[c].kernel_name == gps1.models[c].kernel_name


def test_run_search_sweep_mode(tutorial_data, tmp_path):
    """run_search(sweep_options=) chunks outcomes through the resumable
    search sweep (search/sweep.py); a second call rehydrates FittedGP
    handles from the checkpoint whose predictions match the fresh fit."""
    X_df, Y_df = tutorial_data
    from waveome_tpu import GPSearch

    ck = str(tmp_path / "search_ck")

    def build():
        gps = GPSearch(X=X_df, Y=Y_df, unit_col="id",
                       categorical_vars=["female"],
                       Y_transform="standardize")
        gps.run_search(
            kernels=("squared_exponential", "linear"),
            max_depth=1, num_restart=1, max_iter=100,
            num_inducing_points=100, random_seed=3,
            sweep_options={"checkpoint_dir": ck, "chunk_size": 2},
        )
        return gps

    gps1 = build()
    assert set(gps1.models) == set(Y_df.columns)

    gps2 = build()  # rehydrates from the checkpoint
    for c in Y_df.columns:
        assert gps2.models[c].kernel_name == gps1.models[c].kernel_name
        assert gps2.models[c].bic == gps1.models[c].bic
        np.testing.assert_allclose(
            gps2.search_info[c]["var_exp"], gps1.search_info[c]["var_exp"])
        mu1, _ = gps1.models[c].predict_y(gps1.X.to_numpy())
        mu2, _ = gps2.models[c].predict_y(gps2.X.to_numpy())
        np.testing.assert_allclose(np.asarray(mu2), np.asarray(mu1),
                                   rtol=1e-5, atol=1e-6)
    # heatmap frame builds from rehydrated search_info
    frame = gps2.importance_frame()
    assert set(frame.index) == set(Y_df.columns)
    # the search-mode heatmap (fractional var_exp rows + residual) must
    # render under the reference filtering semantics — this is the
    # artifact path of the real-data search examples
    g = gps2.plot_heatmap(var_cutoff=0.0, metric_cutoff=0.05)
    assert g is not None


def test_run_search_sweep_deadline(tutorial_data, tmp_path):
    """sweep_options deadline_s bounds the sweep's wall clock: the
    in-flight chunk completes, no NEW chunk starts, and a later call
    without a deadline finishes the remaining outcomes from the same
    checkpoint (the cross-session accumulation mode of the real-data
    full-metabolome search, examples/ihmp_real.py)."""
    X_df, Y_df = tutorial_data
    from waveome_tpu import GPSearch

    ck = str(tmp_path / "deadline_ck")
    kwargs = dict(
        kernels=("squared_exponential", "linear"),
        max_depth=1, num_restart=1, max_iter=100,
        num_inducing_points=100, random_seed=3,
    )

    gps1 = GPSearch(X=X_df, Y=Y_df, unit_col="id",
                    categorical_vars=["female"],
                    Y_transform="standardize")
    # any chunk takes far longer than 50 ms, so exactly chunk 0 (2 of
    # the 3 outcomes) completes before the budget check stops the sweep
    gps1.run_search(sweep_options={"checkpoint_dir": ck, "chunk_size": 2,
                                   "deadline_s": 0.05}, **kwargs)
    assert len(gps1.models) == 2

    gps2 = GPSearch(X=X_df, Y=Y_df, unit_col="id",
                    categorical_vars=["female"],
                    Y_transform="standardize")
    gps2.run_search(sweep_options={"checkpoint_dir": ck,
                                   "chunk_size": 2}, **kwargs)
    assert set(gps2.models) == set(Y_df.columns)
    # the two deadline-run outcomes rehydrated rather than refitted
    for c in gps1.models:
        assert gps2.models[c].kernel_name == gps1.models[c].kernel_name
        assert gps2.models[c].bic == gps1.models[c].bic


def test_gpsearch_pickle_roundtrip(fitted_gps):
    """The reference's documented persistence is pickling the whole
    GPSearch object (ihmp_waveome_hpc_run.py:179-180); the functional
    handles must survive the round trip with identical predictions."""
    import pickle

    gps = fitted_gps
    g2 = pickle.loads(pickle.dumps(gps))
    name = gps.Y.columns[0]
    mu1, _ = gps.models[name].predict_y(gps.X.to_numpy())
    mu2, _ = g2.models[name].predict_y(g2.X.to_numpy())
    np.testing.assert_allclose(np.asarray(mu2), np.asarray(mu1))
    assert g2.models[name].kernel_name == gps.models[name].kernel_name
