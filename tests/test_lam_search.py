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
    n_units, n_per = 10, 6
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
        max_iter=120, random_seed=0, verbose=False,
    )
    assert out["best_lambda"] in [0.0, 0.01, 5.0]
    assert "final_model" in out
    assert "component_mask" in out["final_model"]
