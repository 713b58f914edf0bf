"""Optimizer layer tests: L-BFGS convergence + masking, natural-gradient
one-step optimality for Gaussian likelihood, Adam loop semantics, restarts,
and an end-to-end SVGP fit recovering exact-GPR-quality NLL.
"""

import jax
import jax.numpy as jnp
import numpy as np

from waveome_tpu.bijectors import softplus_inv
from waveome_tpu.kernels import KernelSpec, Primitive, gram, single
from waveome_tpu.models import svgp
from waveome_tpu.optimize import (
    adam_natgrad_fit,
    lbfgs_fit,
    natgrad_step,
    lbfgs_fit as _lb,
    random_restart_fit,
)

rng = np.random.default_rng(3)


def test_lbfgs_quadratic():
    A = jnp.asarray(rng.normal(size=(6, 6)))
    A = A @ A.T + 6 * jnp.eye(6)
    b = jnp.asarray(rng.normal(size=6))

    def loss(p):
        x = p["x"]
        return 0.5 * x @ A @ x - b @ x

    res = lbfgs_fit(loss, {"x": jnp.zeros(6)}, max_iter=100)
    expected = np.linalg.solve(np.asarray(A), np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.params["x"]), expected,
                               rtol=1e-6)
    assert bool(res.converged)


def test_lbfgs_mask_freezes_entries():
    def loss(p):
        return jnp.sum((p["x"] - 3.0) ** 2)

    mask = {"x": jnp.asarray([True, False, True])}
    res = lbfgs_fit(loss, {"x": jnp.zeros(3)}, mask=mask, max_iter=50)
    np.testing.assert_allclose(np.asarray(res.params["x"]), [3.0, 0.0, 3.0],
                               atol=1e-8)


def test_lbfgs_vmap_batch():
    targets = jnp.asarray(rng.normal(size=(4, 5)))

    def fit_one(t):
        return lbfgs_fit(
            lambda p: jnp.sum((p["x"] - t) ** 2), {"x": jnp.zeros(5)},
            max_iter=50,
        ).params["x"]

    out = jax.jit(jax.vmap(fit_one))(targets)
    np.testing.assert_allclose(np.asarray(out), np.asarray(targets),
                               atol=1e-8)


def test_lbfgs_nan_rollback():
    def loss(p):
        return jnp.where(jnp.sum(p["x"] ** 2) > 0.0, jnp.nan, 1.0)

    res = lbfgs_fit(loss, {"x": jnp.ones(3)}, max_iter=20)
    np.testing.assert_allclose(np.asarray(res.params["x"]), np.ones(3))


def _svgp_setup(n=25, likelihood="gaussian"):
    X = np.column_stack([
        rng.integers(0, 3, n).astype(float),
        rng.normal(size=n),
    ])
    f = np.sin(2 * X[:, 1]) + 0.5 * X[:, 0]
    Y = f + 0.2 * rng.normal(size=n)
    X, Y = jnp.asarray(X), jnp.asarray(Y[:, None])
    spec = KernelSpec((
        (Primitive("categorical", 0),),
        (Primitive("squared_exponential", 1),),
    ))
    config = svgp.make_config(spec, likelihood, num_data=n, input_dim=2)
    params = svgp.init_params(config, X)
    return config, params, X, Y


def test_natgrad_one_step_optimal_for_gaussian():
    """With a Gaussian likelihood, a single γ=1 natural-gradient step lands
    on the optimal variational distribution (the property gpflow's
    NaturalGradient docs demonstrate)."""
    config, params, X, Y = _svgp_setup()

    def loss_q(q_mu, q_sqrt_raw):
        p = dict(params)
        p["q_mu"] = q_mu
        p["q_sqrt_raw"] = q_sqrt_raw
        return -svgp.elbo(config, p, X, Y)

    g_mu, g_sq = jax.grad(loss_q, argnums=(0, 1))(
        params["q_mu"], params["q_sqrt_raw"]
    )
    new_mu, new_sqrt = natgrad_step(
        g_mu, g_sq, params["q_mu"], jnp.tril(params["q_sqrt_raw"]), 1.0
    )
    # at the optimum the q-gradient vanishes
    g2_mu, g2_sq = jax.grad(loss_q, argnums=(0, 1))(new_mu, new_sqrt)
    assert float(jnp.abs(g2_mu).max()) < 1e-6
    assert float(jnp.abs(jnp.tril(g2_sq)).max()) < 1e-6


def test_lbfgs_svgp_fit_reaches_good_elbo():
    config, params, X, Y = _svgp_setup()
    mask = svgp.train_mask(config, params)

    def loss(p):
        return svgp.training_loss(config, p, X, Y)

    res = lbfgs_fit(loss, params, mask=mask, max_iter=300)
    assert bool(jnp.isfinite(res.loss))
    # optimized ELBO should beat the init by a lot and approach the exact
    # GPR evidence with optimized hyperparameters
    assert float(loss(params)) - float(res.loss) > 5.0


def test_adam_natgrad_loop_improves_and_stops():
    config, params, X, Y = _svgp_setup()
    mask = svgp.train_mask(config, params)

    def loss(p):
        return svgp.training_loss(config, p, X, Y)

    res = adam_natgrad_fit(
        loss, params, mask=mask, learning_rate=0.05, num_opt_iter=600,
        convergence_threshold=1e-6,
    )
    assert float(res.loss) < float(loss(params))
    assert bool(jnp.isfinite(res.loss))


def test_adam_loss_guard_rule_and_fast_path():
    """needs_loss_guard: the expensive 4-candidate variational guard is
    statically reserved for unbounded-Fisher exp-link likelihoods
    (Poisson/Gamma/Exponential at real count scales NaN the plain
    natgrad); tame likelihoods take the plain fast step, and both paths
    must improve the ELBO."""
    from waveome_tpu.likelihoods import needs_loss_guard

    assert needs_loss_guard("poisson")
    assert needs_loss_guard("gamma") and needs_loss_guard("exponential")
    for tame in ("negative_binomial", "zeroinflated_negativebinomial",
                 "bernoulli", "gaussian"):
        assert not needs_loss_guard(tame)

    config, params, X, Y = _svgp_setup()
    mask = svgp.train_mask(config, params)

    def loss(p):
        return svgp.training_loss(config, p, X, Y)

    for guard in (False, True):
        res = adam_natgrad_fit(
            loss, params, mask=mask, learning_rate=0.05,
            num_opt_iter=300, convergence_threshold=1e-6,
            loss_guard=guard,
        )
        assert float(res.loss) < float(loss(params))
        assert bool(jnp.isfinite(res.loss))


def test_adam_guarded_survives_extreme_scale_poisson():
    """Real-scale Poisson regression (counts ~1e6, the Breastmilk
    failure mode): with the loss guard + NaN step-decay recovery the fit
    must end FINITE and strictly better than its initialization — the
    old rollback-and-give-up semantics froze every candidate at init."""
    from waveome_tpu.likelihoods import needs_loss_guard

    rng_l = np.random.default_rng(11)
    N = 48
    Xl = np.linspace(0, 1, N)[:, None].astype(np.float32)
    f = 14.0 + 1.0 * np.sin(6 * Xl[:, 0])
    Yl = rng_l.poisson(np.exp(f)).astype(np.float32)[:, None]

    spec = KernelSpec(((Primitive("squared_exponential", 0),),))
    config = svgp.make_config(spec, "poisson", num_data=N, input_dim=1,
                              num_inducing_points=16)
    params = svgp.init_params(config, jnp.asarray(Xl),
                              key=jax.random.PRNGKey(0))
    # GLM-style init (as the drivers do) then optimize guarded
    params = dict(params)
    params["mean_c"] = jnp.log(jnp.mean(jnp.asarray(Yl)))[None]
    mask = svgp.train_mask(config, params)

    def loss(p):
        return svgp.training_loss(config, p, jnp.asarray(Xl),
                                  jnp.asarray(Yl))

    res = adam_natgrad_fit(
        loss, params, mask=mask, num_opt_iter=400,
        loss_guard=needs_loss_guard("poisson"),
    )
    assert bool(jnp.isfinite(res.loss))
    assert float(res.loss) < float(loss(params)) - 1.0


def test_random_restart_picks_best():
    config, params, X, Y = _svgp_setup()
    mask = svgp.train_mask(config, params)

    def loss(p):
        return svgp.training_loss(config, p, X, Y)

    def randomize(p, key):
        return svgp.randomize_params(config, p, key, scale=0.5)

    best_params, best_loss = random_restart_fit(
        loss, params, randomize, jax.random.PRNGKey(0), num_restart=2,
        mask=mask, max_iter=150,
    )
    single_loss = float(lbfgs_fit(loss, params, mask=mask, max_iter=150).loss)
    assert float(best_loss) <= single_loss + 1e-6


def test_plbfgs_trial_sequential_matches_vmap():
    """trial_sequential=True (lax.map trial grid — the large-N memory
    guard, fit/batch.py) must follow the identical optimization
    trajectory as the vmapped grid."""
    from waveome_tpu.optimize.plbfgs import plbfgs_fit

    A = jnp.asarray(rng.normal(size=(6, 6)))
    A = A @ A.T + 6 * jnp.eye(6)
    b = jnp.asarray(rng.normal(size=6))

    def loss(p):
        x = p["x"]
        return 0.5 * x @ A @ x - b @ x

    mask = {"x": np.ones(6, dtype=bool)}
    r_vmap = plbfgs_fit(loss, {"x": jnp.zeros(6)}, mask, max_iter=60)
    r_seq = plbfgs_fit(loss, {"x": jnp.zeros(6)}, mask, max_iter=60,
                       trial_sequential=True)
    np.testing.assert_allclose(np.asarray(r_seq.params["x"]),
                               np.asarray(r_vmap.params["x"]),
                               rtol=0, atol=0)
    assert int(r_seq.num_iters) == int(r_vmap.num_iters)
