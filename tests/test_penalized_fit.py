"""Integration tests for the penalized (horseshoe) pipeline — the
minimum end-to-end slice of SURVEY.md §7 milestone 4, on data with known
structure (the overview-tutorial simulation: sin(t), gender×cos(t),
linear+random-intercept — waveome_overview.ipynb cells 4, 8-9).
"""

import jax
import jax.numpy as jnp
import numpy as np

from waveome_tpu.fit import (
    auto_penalization_factor,
    fit_outcomes_penalized,
    penalized_fit,
    prune_masks,
)
from waveome_tpu.kernels import full_kernel_build
from waveome_tpu.models import svgp


def _sim_data(n_units=12, n_per=8, seed=0):
    rng = np.random.default_rng(seed)
    ids = np.repeat(np.arange(n_units), n_per).astype(float)
    time = np.tile(np.linspace(-2, 2, n_per), n_units)
    female = np.repeat((np.arange(n_units) % 2).astype(float), n_per)
    X = np.column_stack([ids, time, female])
    n = X.shape[0]
    y1 = np.sin(1.5 * time) + 0.25 * rng.normal(size=n)
    y2 = female * np.cos(1.5 * time) + 0.25 * rng.normal(size=n)
    unit_int = rng.normal(size=n_units)[ids.astype(int)]
    y3 = 0.8 * time + unit_int + 0.25 * rng.normal(size=n)
    Ys = np.column_stack([y1, y2, y3])
    return jnp.asarray(X), jnp.asarray(Ys)


def _setup():
    X, Ys = _sim_data()
    spec, names = full_kernel_build(
        cat_vars=[0, 2], num_vars=[1], unit_idx=0,
        var_names=["id", "time", "female"], return_sum=True,
    )
    # components: cat[id], cat[female], SE[time], cat[female]*SE[time]
    return X, Ys, spec, names


def test_auto_factor_formula():
    import scipy.stats as st

    got = float(auto_penalization_factor(jnp.asarray(1.3), 96, 4))
    expected = 2 * 1.1 * 1.3 * np.sqrt(96) * st.norm().ppf(1 - 0.1 / 8)
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_penalized_fit_recovers_structure():
    X, Ys, spec, names = _setup()
    config = svgp.make_config(spec, "gaussian", num_data=X.shape[0],
                              input_dim=3, num_inducing_points=500)
    params0 = svgp.init_params(config, X)

    # outcome 1: pure sin(time) — SE[time] must survive, female terms die
    res = penalized_fit(config, params0, X, Ys[:, 0:1], num_factor_iter=0,
                        max_iter=300)
    mask = np.asarray(res.component_mask)
    assert mask[2] == 1.0, f"SE[time] pruned: {mask}"
    assert mask[1] == 0.0, f"cat[female] survived on sin outcome: {mask}"

    # outcome 2: female×cos(time) — interaction term must survive
    res2 = penalized_fit(config, params0, X, Ys[:, 1:2], num_factor_iter=0,
                         max_iter=300)
    mask2 = np.asarray(res2.component_mask)
    assert mask2[3] == 1.0, f"interaction pruned: {mask2}"

    # outcome 3: trend + random intercept — cat[id] must survive
    res3 = penalized_fit(config, params0, X, Ys[:, 2:3], num_factor_iter=0,
                         max_iter=300)
    mask3 = np.asarray(res3.component_mask)
    assert mask3[0] == 1.0, f"cat[id] pruned: {mask3}"
    assert mask3[2] == 1.0, f"time trend pruned: {mask3}"

    # importances: the surviving true component dominates
    imp = np.asarray(res.importances)
    assert imp.shape == (5,)
    assert imp[2] == imp[:4].max()
    # loss finite and factor positive
    assert np.isfinite(float(res.loss))
    assert float(res.penalization_factor) > 0


def test_factor_iteration_shrinks_factor():
    X, Ys, spec, _ = _setup()
    config = svgp.make_config(spec, "gaussian", num_data=X.shape[0],
                              input_dim=3)
    params0 = svgp.init_params(config, X)
    res_it = penalized_fit(config, params0, X, Ys[:, 0:1],
                           num_factor_iter=3, max_iter=200)
    # σ̂ starts at std(Y)≈0.75 and should shrink toward residual sd ≈0.25,
    # so the final factor is below the initial auto factor
    init_factor = float(auto_penalization_factor(
        jnp.std(Ys[:, 0], ddof=1), X.shape[0], 4))
    assert float(res_it.penalization_factor) <= init_factor + 1e-6
    assert np.isfinite(float(res_it.loss))


def test_batched_fit_matches_single_and_shards():
    X, Ys, spec, _ = _setup()
    batch = fit_outcomes_penalized(
        X, Ys, spec, likelihood="gaussian", num_factor_iter=0, max_iter=300,
        use_mesh=True,
    )
    assert batch.num_outcomes == 3
    config = batch.config
    params0 = svgp.init_params(config, X)
    single = penalized_fit(config, params0, X, Ys[:, 0:1], num_factor_iter=0,
                           max_iter=300)
    b0 = batch.for_outcome(0)
    np.testing.assert_allclose(np.asarray(b0.component_mask),
                               np.asarray(single.component_mask))
    # under vmap the while_loop runs until ALL batch members converge, so a
    # batched member may take extra (improving) L-BFGS steps — compare up to
    # optimization variability, batched should be at least as good
    assert float(b0.loss) <= float(single.loss) + 0.1
    np.testing.assert_allclose(np.asarray(b0.importances),
                               np.asarray(single.importances), atol=0.5)


def test_prune_masks_var_and_lengthscale():
    X, Ys, spec, _ = _setup()
    config = svgp.make_config(spec, "gaussian", num_data=X.shape[0],
                              input_dim=3)
    params = svgp.init_params(config, X)
    # default params: all variances 1 → all kept
    cm, fm = prune_masks(config, params, X)
    assert np.asarray(cm).sum() == 4
    # push SE[time] lengthscale above 3×range(time)=12 → factor dropped,
    # component 2 (single-factor) disappears; interaction keeps cat factor
    from waveome_tpu.bijectors import softplus_inv

    raw = params["kernel_raw"]
    raw = raw.at[2, 0, 1].set(softplus_inv(20.0))
    raw = raw.at[3, 1, 1].set(softplus_inv(20.0))
    params = dict(params, kernel_raw=raw)
    cm, fm = prune_masks(config, params, X)
    cm, fm = np.asarray(cm), np.asarray(fm)
    assert cm[2] == 0.0
    assert cm[3] == 1.0 and fm[3, 0] == 1.0 and fm[3, 1] == 0.0


def test_segmented_mesh_matches_single_device():
    """Segmented driver under the 8-device CPU mesh (sharded outcome
    axis, batch padded to a device multiple, compaction in device
    multiples) produces the same fits as the single-device segmented
    run."""
    X, Ys, spec, _ = _setup()
    # 10 outcomes -> padded to 16 on 8 devices; small segments force
    # several compaction rounds
    Ys10 = np.concatenate([Ys, Ys, Ys, Ys[:, :1]], axis=1)
    kw = dict(spec=spec, likelihood="gaussian", num_factor_iter=0,
              max_iter=200, device_chunk=4)
    mesh_run = fit_outcomes_penalized(X, Ys10, use_mesh=True, **kw)
    single = fit_outcomes_penalized(X, Ys10, use_mesh=False, **kw)
    assert mesh_run.num_outcomes == 10
    lm = np.asarray(mesh_run.results.loss)
    ls = np.asarray(single.results.loss)
    assert np.all(np.isfinite(lm))
    np.testing.assert_allclose(lm, ls, rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(mesh_run.results.component_mask),
        np.asarray(single.results.component_mask))
