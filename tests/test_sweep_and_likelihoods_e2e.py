"""Chunked sweep driver (resume semantics) + non-Gaussian end-to-end fits
+ GPSearch.run_search smoke test."""

import numpy as np
import pandas as pd

from waveome_tpu.fit.sweep import run_penalized_sweep
from waveome_tpu.kernels import full_kernel_build
from waveome_tpu.fit import penalized_fit
from waveome_tpu.models import svgp


def _design(n_units=8, n_per=6, seed=0):
    rng = np.random.default_rng(seed)
    ids = np.repeat(np.arange(n_units), n_per).astype(float)
    t = np.tile(np.linspace(-2, 2, n_per), n_units)
    X = np.column_stack([ids, t])
    return X, t, rng


def test_sweep_chunks_and_resume(tmp_path):
    X, t, rng = _design()
    B = 5
    Ys = np.column_stack([
        np.sin(1.5 * t + i) + 0.2 * rng.normal(size=X.shape[0])
        for i in range(B)
    ])
    spec, _ = full_kernel_build(cat_vars=[0], num_vars=[1], unit_idx=0,
                                var_names=["id", "t"], return_sum=True)
    ckdir = str(tmp_path / "sweep")
    res = run_penalized_sweep(
        X, Ys, spec, checkpoint_dir=ckdir, chunk_size=2,
        num_factor_iter=0, max_iter=100, verbose=False,
    )
    assert len(res) == B
    # resume: nothing left to FIT, but already-persisted outcomes are
    # rehydrated from the checkpoint (so GPSearch sweep-mode callers get
    # complete model tables after a restart)
    res2 = run_penalized_sweep(
        X, Ys, spec, checkpoint_dir=ckdir, chunk_size=2,
        num_factor_iter=0, max_iter=100, verbose=False,
    )
    assert set(res2) == set(res)
    np.testing.assert_allclose(res2["y0"]["importances"],
                               res["y0"]["importances"])
    # persisted params can be reloaded
    from waveome_tpu.checkpoint import SweepCheckpoint

    ck = SweepCheckpoint(ckdir)
    assert len(ck.fitted()) == B
    loaded = ck.load_outcome("y0")
    assert "params" in loaded and "component_mask" in loaded


def test_poisson_penalized_fit_e2e():
    X, t, rng = _design(seed=1)
    f = 1.2 * np.sin(1.5 * t)
    Y = rng.poisson(np.exp(f)).astype(float)[:, None]
    spec, _ = full_kernel_build(cat_vars=[0], num_vars=[1], unit_idx=0,
                                var_names=["id", "t"], return_sum=True)
    config = svgp.make_config(spec, "poisson", num_data=X.shape[0],
                              input_dim=2)
    params0 = svgp.init_params(config, X)
    res = penalized_fit(config, params0, X, Y,
                        penalization_factor=10.0, num_factor_iter=0,
                        max_iter=150)
    assert np.isfinite(float(res.loss))
    # the time component should survive on a sin-driven rate
    assert np.asarray(res.component_mask)[1] == 1.0
    assert np.isfinite(np.asarray(res.importances)).all()


def test_negative_binomial_penalized_fit_e2e():
    X, t, rng = _design(seed=2)
    f = 1.0 * np.sin(1.5 * t) + 1.0
    m = np.exp(f)
    r = 2.0  # 1/alpha
    Y = rng.negative_binomial(r, r / (m + r)).astype(float)[:, None]
    spec, _ = full_kernel_build(cat_vars=[0], num_vars=[1], unit_idx=0,
                                var_names=["id", "t"], return_sum=True)
    config = svgp.make_config(spec, "negativebinomial",
                              num_data=X.shape[0], input_dim=2)
    params0 = svgp.init_params(config, X)
    res = penalized_fit(config, params0, X, Y,
                        penalization_factor=10.0, num_factor_iter=0,
                        max_iter=150)
    assert np.isfinite(float(res.loss))
    assert np.isfinite(np.asarray(res.importances)).all()


def test_gpsearch_run_search_smoke():
    X, t, rng = _design(n_units=8, n_per=6, seed=3)
    Xdf = pd.DataFrame({"id": X[:, 0], "t": X[:, 1]})
    Ydf = pd.DataFrame({
        "y": np.sin(1.8 * t) + 0.2 * rng.normal(size=X.shape[0])
    })
    from waveome_tpu import GPSearch

    gps = GPSearch(X=Xdf, Y=Ydf, unit_col="id",
                   outcome_likelihood="gaussian")
    gps.run_search(kernels=["squared_exponential"], max_depth=2,
                   num_restart=1, max_iter=150, verbose=False)
    model = gps.models["y"]
    assert "squared_exponential" in model.kernel_name
    assert "y" in gps.search_info
    assert "var_exp" in gps.search_info["y"]