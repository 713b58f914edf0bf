"""CV λ / penalization-factor search tests."""

import numpy as np
import pytest

from waveome_tpu.kernels import full_kernel_build
from waveome_tpu.search.lam import (
    auto_lambda_grid,
    lam_search,
    penalization_search,
)


def _sim(seed=0):
    rng = np.random.default_rng(seed)
    # 8x6 = the shared design size across the suite: distinct shapes
    # compile distinct vmapped cell programs (cold-compile tax)
    n_units, n_per = 8, 6
    ids = np.repeat(np.arange(n_units), n_per).astype(float)
    t = np.tile(np.linspace(-2, 2, n_per), n_units)
    X = np.column_stack([ids, t])
    Y = np.sin(1.5 * t) + 0.25 * rng.normal(size=n_units * n_per)
    return X, Y[:, None]


def test_auto_lambda_grid_shape():
    Y = np.random.default_rng(0).normal(size=100)
    grid = auto_lambda_grid(Y, num_lams=10)
    assert len(grid) == 10
    assert grid[0] == 0.0
    assert np.isclose(grid[-1], round(2 * np.var(Y), 5), atol=1e-4)
    assert all(np.diff(grid) > 0)


def test_penalization_search_selects_and_refits():
    X, Y = _sim()
    spec, _ = full_kernel_build(
        cat_vars=[0], num_vars=[1], unit_idx=0, var_names=["id", "t"],
        return_sum=True,
    )
    out = penalization_search(
        spec, X, Y,
        penalization_factor_list=[0.0, 10.0, 100.0],
        k_fold=3, unit_col=0, max_iter=150, random_seed=0,
    )
    assert out["best_factor"] in [0.0, 10.0, 100.0]
    assert out["results"].shape == (3, 3)
    assert np.isfinite(out["results"]).all()
    assert "final_fit" in out
    # the refit model keeps the true SE component
    assert np.asarray(out["final_fit"].component_mask)[1] == 1.0


def test_lam_search_grid_and_early_stop():
    X, Y = _sim(1)
    spec, _ = full_kernel_build(
        cat_vars=[0], num_vars=[1], unit_idx=0, var_names=["id", "t"],
        return_sum=True,
    )
    out = lam_search(
        spec, X, Y, lam_list=[0.0, 0.01, 5.0], k_fold=3, unit_col=0,
        max_iter=150, random_seed=0, verbose=False,
    )
    assert out["best_lambda"] in [0.0, 0.01, 5.0]
    assert "final_model" in out
    assert "component_mask" in out["final_model"]


def test_multioutput_lam_search_vmapped_cells():
    """The LMC λ×fold CV runs as one vmapped program (folds as weights)."""
    from waveome_tpu.search.lam import multioutput_lam_search

    rng = np.random.default_rng(3)
    n_units, n_per = 8, 6
    ids = np.repeat(np.arange(n_units), n_per).astype(float)
    t = np.tile(np.linspace(-2, 2, n_per), n_units)
    X = np.column_stack([ids, t])
    f = np.sin(1.2 * t)
    Y = np.column_stack([
        f + 0.2 * rng.normal(size=t.size),
        -0.5 * f + 0.2 * rng.normal(size=t.size),
    ])
    out = multioutput_lam_search(
        X, Y, cat_vars=[0], num_vars=[1], unit_idx=0,
        var_names=["id", "t"], lam_list=[0.1, 10.0], k_fold=2,
        num_opt_iter=60, random_seed=0, prune=False,
    )
    assert out["best_lambda"] in [0.1, 10.0]
    lls = np.asarray(
        [out["cv_log_lik"][k] for k in sorted(out["cv_log_lik"])]
    )
    assert lls.shape == (2, 2)
    assert np.isfinite(lls).all()
    assert out["final_model"].params["W"].shape[0] == 2


def test_fit_lmc_cells_matches_single_fit():
    """One vmapped cell with λ and full-data weights ≈ plain fit_lmc."""
    import jax.numpy as jnp

    from waveome_tpu.models import lmc

    rng = np.random.default_rng(4)
    t = np.linspace(-2, 2, 30)
    X = t[:, None]
    Y = np.column_stack([np.sin(t) + 0.1 * rng.normal(size=30)])
    config, _ = lmc.make_lmc_config(
        X, Y, likelihood="gaussian", num_vars=[0],
        num_inducing_points=15, kernel_options={"ranks": 1},
    )
    p0 = lmc.init_lmc_params(config, X, seed=0)
    params_single, loss_single, _ = lmc.fit_lmc(
        config, p0, X, Y, num_opt_iter=50, penalization_factor=1.0,
    )
    params_cells, losses = lmc.fit_lmc_cells(
        config, p0, X, Y, lams=np.array([1.0]),
        weight_rows=np.ones((1, 30)), num_opt_iter=50,
    )
    assert np.allclose(float(losses[0]), loss_single, rtol=1e-4)
    assert np.allclose(
        np.asarray(params_cells["W"][0]), np.asarray(params_single["W"]),
        atol=1e-5,
    )


def test_fit_lmc_cells_mesh_matches_single_device():
    """(λ × fold) LMC cells sharded over the 8-device CPU mesh (the
    multi-chip replacement for the reference's Ray cell farm,
    model_search.py:707-761) reproduce the unsharded results — including
    a cell count that does NOT divide the mesh (pad-and-slice leg)."""
    import jax

    from waveome_tpu.models import lmc
    from waveome_tpu.parallel.mesh import outcome_mesh

    rng = np.random.default_rng(5)
    t = np.linspace(-2, 2, 24)
    X = t[:, None]
    Y = np.column_stack([
        np.sin(t) + 0.1 * rng.normal(size=24),
        np.cos(t) + 0.1 * rng.normal(size=24),
    ])
    config, _ = lmc.make_lmc_config(
        X, Y, likelihood="gaussian", num_vars=[0],
        num_inducing_points=12, kernel_options={"ranks": 1},
    )
    p0 = lmc.init_lmc_params(config, X, seed=0)
    K = 3  # deliberately not a multiple of 8 devices
    lams = np.array([0.5, 1.0, 5.0])
    w_rows = (rng.random((K, 24)) > 0.25).astype(np.float64)

    _, losses_plain = lmc.fit_lmc_cells(
        config, p0, X, Y, lams=lams, weight_rows=w_rows, num_opt_iter=40,
    )
    mesh = outcome_mesh(jax.devices()[:8])
    _, losses_mesh = lmc.fit_lmc_cells(
        config, p0, X, Y, lams=lams, weight_rows=w_rows, num_opt_iter=40,
        mesh=mesh,
    )
    assert losses_mesh.shape == (K,)
    np.testing.assert_allclose(np.asarray(losses_mesh),
                               np.asarray(losses_plain), rtol=1e-5)
