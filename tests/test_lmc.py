"""LMC multi-output model tests: rank estimation, smart inducing init,
ELBO consistency with single-output SVGP, fitting, and latent pruning."""

import jax.numpy as jnp
import numpy as np

from waveome_tpu.kernels.spec import KernelSpec, Primitive, single
from waveome_tpu.models import lmc, svgp


def _sim(seed=0, n_units=8, n_per=6, P=4):
    rng = np.random.default_rng(seed)
    ids = np.repeat(np.arange(n_units), n_per).astype(float)
    t = np.tile(np.linspace(-2, 2, n_per), n_units)
    X = np.column_stack([ids, t])
    n = X.shape[0]
    g1 = np.sin(1.5 * t)
    g2 = rng.normal(size=n_units)[ids.astype(int)]
    W = rng.normal(size=(P, 2))
    F = np.column_stack([g1, g2]) @ W.T
    Y = F + 0.2 * rng.normal(size=(n, P))
    return X, Y


def test_rank_estimate_low_rank():
    X, Y = _sim(P=6)
    q = lmc.calculate_rank_estimate(Y, threshold=0.9,
                                    transform_counts=False)
    assert 1 <= q <= 3  # data is rank-2 + noise


def test_smart_inducing_init():
    rng = np.random.default_rng(0)
    X = np.column_stack([
        np.repeat(np.arange(5), 4).astype(float),
        np.linspace(0, 10, 20),
    ])
    Zc = lmc._smart_inducing_init(single("categorical", 0), X, 8, rng)
    assert set(np.round(Zc[:, 0])).issubset(set(range(5)))
    Zn = lmc._smart_inducing_init(single("squared_exponential", 1), X, 8,
                                  rng)
    np.testing.assert_allclose(Zn[:, 1], np.linspace(0, 10, 8))


def test_lmc_single_latent_single_output_matches_svgp():
    """With Q=1, P=1, W=1, mean 0 and shared Z, the LMC ELBO equals the
    single-output SVGP ELBO with the same kernel."""
    X, Y = _sim(P=1)
    Y = Y[:, :1]
    spec = single("squared_exponential", 1)
    config = lmc.LMCConfig(
        latent_specs=(spec,), likelihood=svgp.make_config(
            spec, "gaussian", 1, 1).likelihood,
        num_inducing=X.shape[0], num_outputs=1, input_dim=2,
        penalization_factor=0.0,
    )
    params = lmc.init_lmc_params(config, X, seed=0)
    params["W"] = jnp.ones((1, 1), dtype=params["W"].dtype)
    params["z"] = jnp.asarray(X)[None, :, :]

    el_lmc = float(lmc.lmc_elbo(config, params, jnp.asarray(X),
                                jnp.asarray(Y)))

    scfg = svgp.make_config(spec, "gaussian", num_data=X.shape[0],
                            input_dim=2, num_inducing_points=X.shape[0])
    sp = svgp.init_params(scfg, jnp.asarray(X))
    sp["kernel_raw"] = params["kernel_raw"][0]
    el_svgp = float(svgp.elbo(scfg, sp, jnp.asarray(X), jnp.asarray(Y)))
    np.testing.assert_allclose(el_lmc, el_svgp, rtol=1e-8)


def test_fit_multioutput_end_to_end():
    X, Y = _sim(P=3)
    res = lmc.fit_multioutput(
        X, Y,
        cat_vars=[0], num_vars=[1], unit_idx=0,
        var_names=["id", "t"],
        kernel_options={"ranks": 2},
        sparse_options={"num_inducing_points": 20},
        num_opt_iter=300,
        random_seed=0,
    )
    # unit col is removed from cat_vars (regularization.py:60), leaving
    # cat[id] and SE[t], each replicated rank-2 → 4 latents
    assert res.config.num_latents == 4
    Fmu, Fvar = lmc.lmc_predict_y(res.config, res.params, X)
    assert Fmu.shape == (X.shape[0], 3)
    assert np.all(np.isfinite(np.asarray(Fmu)))
    # fit should explain a good share of variance
    r2 = 1 - np.sum((np.asarray(Fmu) - Y) ** 2) / np.sum(
        (Y - Y.mean(0)) ** 2
    )
    assert r2 > 0.5, r2


def test_prune_latent_factors_mask():
    X, Y = _sim(P=2)
    spec = single("squared_exponential", 1)
    config = lmc.LMCConfig(
        latent_specs=(spec, spec, spec),
        likelihood=svgp.make_config(spec, "gaussian", 1, 1).likelihood,
        num_inducing=10, num_outputs=2, input_dim=2,
    )
    params = lmc.init_lmc_params(config, X, seed=0)
    W = np.zeros((2, 3))
    W[:, 0] = [1.0, -0.5]
    W[:, 2] = [0.05, 0.02]  # below threshold
    params["W"] = jnp.asarray(W)
    mask = np.asarray(lmc.prune_latent_factors(config, params, 0.1))
    np.testing.assert_allclose(mask, [1.0, 0.0, 0.0])
    # all-pruned fallback keeps argmax
    params["W"] = jnp.asarray(np.full((2, 3), 0.01))
    mask = np.asarray(lmc.prune_latent_factors(config, params, 0.1))
    assert mask.sum() == 1


def test_lam_canonicalized_out_of_program_key():
    """Configs differing only in penalization_factor must map to ONE
    jitted LMC program (lambda enters traced; compiling per-lambda was
    the suite's duplicate-program cost)."""
    import dataclasses

    from waveome_tpu.models.lmc import _canon_config

    spec = single("squared_exponential", 1)
    base = lmc.LMCConfig(
        latent_specs=(spec,),
        likelihood=svgp.make_config(spec, "gaussian", 1, 1).likelihood,
        num_inducing=10, num_outputs=2, input_dim=2,
        penalization_factor=1.0,
    )
    other = dataclasses.replace(base, penalization_factor=37.5)
    assert _canon_config(base) == _canon_config(other)
    assert hash(_canon_config(base)) == hash(_canon_config(other))
