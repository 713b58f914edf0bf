"""SVGP model tests.

Key identity exercised: with inducing points = data (the reference BaseGP
default, model_classes.py:98-107) and the analytically optimal whitened
q(u), the SVGP ELBO equals the exact GPR log marginal likelihood and
predict_f equals the exact GP posterior — validating conditional, KL and
variational-expectation code in one shot (this is the NLL-parity
[BASELINE.md] check, done against closed-form linear algebra instead of
GPflow).
"""

import jax
import jax.numpy as jnp
import numpy as np

from waveome_tpu.bijectors import softplus_inv
from waveome_tpu.kernels import KernelSpec, Primitive, gram, single
from waveome_tpu.models import gpr, svgp

rng = np.random.default_rng(2)


def _toy_data(n=30):
    X = np.column_stack([
        rng.integers(0, 4, n).astype(float),  # id
        rng.normal(size=n),  # time
    ])
    f = np.sin(2 * X[:, 1]) + 0.3 * X[:, 0]
    Y = f + 0.3 * rng.normal(size=n)
    return jnp.asarray(X), jnp.asarray(Y[:, None])


def _spec():
    return KernelSpec((
        (Primitive("categorical", 0),),
        (Primitive("squared_exponential", 1),),
    ))


def _optimal_whitened_q(spec, raw, X, Y, noise, mean_c=0.0):
    """Closed-form optimal whitened q for Gaussian likelihood, Z = X.

    Uses the model's actual A = L⁻¹Kuf with jittered Kuu, so the identity
    ELBO(q*) = log N(y; c, Q+σ²I) − tr(Kff−Q)/(2σ²) (collapsed Titsias
    bound) holds exactly.
    """
    import scipy.linalg as sl

    N = X.shape[0]
    K = np.asarray(gram(spec, raw, X))
    Kuu = K + 1e-6 * np.eye(N)
    L = np.linalg.cholesky(Kuu)
    A = sl.solve_triangular(L, K, lower=True)  # (M, N)
    Sigma = np.linalg.inv(np.eye(N) + (A @ A.T) / noise)
    q_mu = Sigma @ A @ (np.asarray(Y)[:, 0] - mean_c) / noise
    q_sqrt = np.linalg.cholesky(Sigma)
    return jnp.asarray(q_mu[:, None]), jnp.asarray(q_sqrt), A, K


def test_kl_whitened_closed_form():
    M = 8
    q_mu = rng.normal(size=(M, 1))
    Lq = np.tril(rng.normal(size=(M, M)))
    np.fill_diagonal(Lq, np.abs(np.diag(Lq)) + 0.5)
    params = {"q_mu": jnp.asarray(q_mu), "q_sqrt_raw": jnp.asarray(Lq)}
    got = float(svgp.kl_whitened(params))
    S = Lq @ Lq.T
    expected = 0.5 * (
        np.trace(S) + q_mu[:, 0] @ q_mu[:, 0] - M - np.linalg.slogdet(S)[1]
    )
    np.testing.assert_allclose(got, expected, rtol=1e-10)


def test_elbo_equals_collapsed_bound_at_optimal_q():
    X, Y = _toy_data()
    spec = _spec()
    config = svgp.make_config(spec, "gaussian", num_data=X.shape[0],
                              input_dim=2, num_inducing_points=500)
    assert config.num_inducing == X.shape[0]
    assert not config.train_inducing
    params = svgp.init_params(config, X)
    noise = 0.3 ** 2
    params["lik_raw"] = jnp.asarray([softplus_inv(noise - 1e-6)])
    q_mu, q_sqrt, A, K = _optimal_whitened_q(spec, params["kernel_raw"], X,
                                             Y, noise)
    params["q_mu"] = q_mu
    params["q_sqrt_raw"] = q_sqrt

    elbo_val = float(svgp.elbo(config, params, X, Y))

    N = X.shape[0]
    Q = A.T @ A
    Qy = Q + noise * np.eye(N)
    y = np.asarray(Y)[:, 0]
    lml_q = -0.5 * (
        y @ np.linalg.solve(Qy, y)
        + np.linalg.slogdet(Qy)[1]
        + N * np.log(2 * np.pi)
    )
    expected = lml_q - 0.5 / noise * (np.trace(K) - np.trace(Q))
    np.testing.assert_allclose(elbo_val, expected, rtol=1e-8)
    # with Z = X the bound is within O(jitter) of the exact GPR LML
    Ky = K + noise * np.eye(N)
    lml_exact = -0.5 * (
        y @ np.linalg.solve(Ky, y)
        + np.linalg.slogdet(Ky)[1]
        + N * np.log(2 * np.pi)
    )
    np.testing.assert_allclose(elbo_val, lml_exact, rtol=1e-4)


def test_predict_f_matches_exact_posterior():
    X, Y = _toy_data()
    spec = _spec()
    config = svgp.make_config(spec, "gaussian", num_data=X.shape[0],
                              input_dim=2, num_inducing_points=500)
    params = svgp.init_params(config, X)
    noise = 0.25
    params["lik_raw"] = jnp.asarray([softplus_inv(noise - 1e-6)])
    params["q_mu"], params["q_sqrt_raw"], _, _ = _optimal_whitened_q(
        spec, params["kernel_raw"], X, Y, noise
    )
    Xnew = jnp.asarray(np.column_stack([
        rng.integers(0, 4, 9).astype(float), rng.normal(size=9)
    ]))
    fmu, fvar = svgp.predict_f(config, params, Xnew)

    # Exact identity: at the optimal q, SVGP predictions equal Q-process
    # (SGPR/Titsias) GP regression: μ* = Q*n (Qnn+σ²I)⁻¹ y,
    # Σ* = K** − Q*n (Qnn+σ²I)⁻¹ Qn* — machine-precision, jitter-consistent.
    import scipy.linalg as sl

    N = X.shape[0]
    K = np.asarray(gram(spec, params["kernel_raw"], X))
    Kuu = K + 1e-6 * np.eye(N)
    L = np.linalg.cholesky(Kuu)
    A = sl.solve_triangular(L, K, lower=True)
    Astar = sl.solve_triangular(
        L, np.asarray(gram(spec, params["kernel_raw"], X, Xnew)), lower=True
    )
    Kss = np.asarray(gram(spec, params["kernel_raw"], Xnew))
    Qnn = A.T @ A
    Qsn = Astar.T @ A
    y = np.asarray(Y)[:, 0]
    Qy = Qnn + noise * np.eye(N)
    mu_q = Qsn @ np.linalg.solve(Qy, y)
    cov_q = Kss - Qsn @ np.linalg.solve(Qy, Qsn.T)
    np.testing.assert_allclose(np.asarray(fmu)[:, 0], mu_q, rtol=1e-7,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(fvar)[:, 0], np.diag(cov_q),
                               rtol=1e-6, atol=1e-9)
    # full_cov path
    _, fcov = svgp.predict_f(config, params, Xnew, full_cov=True)
    np.testing.assert_allclose(np.asarray(fcov), cov_q, rtol=1e-6, atol=1e-9)
    # and with Z = X this is within O(jitter·κ) of the exact GP posterior
    Ky = K + noise * np.eye(N)
    mu_exact = np.asarray(
        gram(spec, params["kernel_raw"], X, Xnew)
    ).T @ np.linalg.solve(Ky, y)
    np.testing.assert_allclose(np.asarray(fmu)[:, 0], mu_exact, atol=5e-3)


def test_gpr_lml_matches_dense_formula():
    X, Y = _toy_data(20)
    spec = _spec()
    params = gpr.init_params(spec, jnp.float64)
    lml = float(gpr.log_marginal_likelihood(spec, params, X, Y))
    N = X.shape[0]
    K = np.asarray(gram(spec, params["kernel_raw"], X))
    Ky = K + float(gpr.noise_variance(params)) * np.eye(N)
    y = np.asarray(Y)[:, 0]
    expected = (
        -0.5 * y @ np.linalg.solve(Ky, y)
        - 0.5 * np.linalg.slogdet(Ky)[1]
        - 0.5 * N * np.log(2 * np.pi)
    )
    np.testing.assert_allclose(lml, expected, rtol=1e-9)


def test_gpr_penalty_term():
    """penalized LML = LML − N·λ·Σ variances (model_types_DEPR.py:49-62)."""
    X, Y = _toy_data(15)
    spec = _spec()
    params = gpr.init_params(spec, jnp.float64)
    base = float(gpr.log_marginal_likelihood(spec, params, X, Y))
    pen = float(gpr.penalized_lml(spec, params, X, Y, lam=0.5))
    np.testing.assert_allclose(base - pen, X.shape[0] * 0.5 * 2.0, rtol=1e-6)


def test_log_prior_density_horseshoe():
    X, Y = _toy_data(10)
    spec = KernelSpec((
        (Primitive("categorical", 0),),
        (Primitive("categorical", 0, train_variance=False),
         Primitive("squared_exponential", 1),),
    ))
    config = svgp.make_config(spec, "gaussian", num_data=10, input_dim=2)
    params = svgp.init_params(config, X)
    lp = float(svgp.log_prior_density(config, params, 2.0))
    from waveome_tpu.priors import horseshoe_log_prob

    # trainable variances: comp0 cat (v=1), comp1 SE (v=1); frozen cat excluded
    expected = 2 * float(horseshoe_log_prob(jnp.asarray(1.0), 0.5))
    np.testing.assert_allclose(lp, expected, rtol=1e-8)
    # factor 0 → no prior
    assert float(svgp.log_prior_density(config, params, 0.0)) == 0.0


def test_component_mask_leave_one_out_predictions():
    """Masking component c reproduces predictions of the model with that
    component structurally removed (utilities.py:651-668 semantics)."""
    X, Y = _toy_data(18)
    spec = _spec()
    config = svgp.make_config(spec, "gaussian", num_data=18, input_dim=2)
    params = svgp.init_params(config, X)
    params["q_mu"] = jnp.asarray(rng.normal(size=(18, 1)) * 0.3)

    sub_spec = KernelSpec((spec.components[1],))
    sub_config = svgp.make_config(sub_spec, "gaussian", num_data=18,
                                  input_dim=2)
    sub_params = dict(params)
    sub_params["kernel_raw"] = sub_spec.init_raw_params()

    mask = jnp.asarray([0.0, 1.0])
    mu_mask, var_mask = svgp.predict_f(config, params, X,
                                       component_mask=mask)
    mu_sub, var_sub = svgp.predict_f(sub_config, sub_params, X)
    np.testing.assert_allclose(np.asarray(mu_mask), np.asarray(mu_sub),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(var_mask), np.asarray(var_sub),
                               rtol=1e-6, atol=1e-9)


def test_elbo_vmaps_over_outcomes():
    """The Ray-replacement property: one jitted ELBO, vmapped over a batch
    of outcome columns with per-outcome params."""
    X, _ = _toy_data(16)
    B = 5
    Ys = jnp.asarray(rng.normal(size=(B, 16, 1)))
    spec = _spec()
    config = svgp.make_config(spec, "gaussian", num_data=16, input_dim=2)
    p0 = svgp.init_params(config, X)
    batched = jax.tree.map(lambda a: jnp.stack([a] * B), p0)

    fn = jax.jit(jax.vmap(
        lambda p, y: svgp.elbo(config, p, X, y), in_axes=(0, 0)
    ))
    vals = np.asarray(fn(batched, Ys))
    assert vals.shape == (B,)
    singles = [float(svgp.elbo(config, p0, X, Ys[i])) for i in range(B)]
    np.testing.assert_allclose(vals, singles, rtol=1e-9)


def test_coded_structure_elbo_matches_static():
    X, Y = _toy_data(12)
    spec = _spec().padded(3, 2)
    cfg_s = svgp.make_config(spec, "gaussian", num_data=12, input_dim=2)
    cfg_c = svgp.make_config(spec, "gaussian", num_data=12, input_dim=2,
                             coded_structure=True)
    params = svgp.init_params(cfg_s, X)
    e_static = float(svgp.elbo(cfg_s, params, X, Y))
    e_coded = float(svgp.elbo(cfg_c, params, X, Y, coded=spec.coded()))
    np.testing.assert_allclose(e_coded, e_static, rtol=1e-9)
