"""Likelihood layer tests: log-prob golden values vs scipy, quadrature vs
closed forms, conditional moments, and the NB/ZINB formulas of
waveome/likelihoods.py.
"""

import math

import jax.numpy as jnp
import numpy as np
import scipy.stats as st

from waveome_tpu.likelihoods import (
    gauss_hermite,
    gauss_hermite_logspace,
    gp_likelihood_crosswalk,
    nb_log_prob,
)

rng = np.random.default_rng(1)


def test_crosswalk_aliases():
    assert gp_likelihood_crosswalk("negativebinomial").name == (
        "negative_binomial"
    )
    assert gp_likelihood_crosswalk("binomial").name == "bernoulli"
    assert gp_likelihood_crosswalk("gaussian").n_params == 1
    try:
        gp_likelihood_crosswalk("nope")
        assert False
    except ValueError:
        pass


def test_param_constrain_roundtrip():
    for name in ["gaussian", "gamma", "negative_binomial",
                 "zeroinflated_negativebinomial"]:
        lik = gp_likelihood_crosswalk(name)
        p = np.asarray(lik.constrain(lik.init_raw()))
        np.testing.assert_allclose(p, lik.param_inits, rtol=1e-6)


def test_gaussian_logprob_vs_scipy():
    lik = gp_likelihood_crosswalk("gaussian")
    raw = lik.init_raw()
    F = jnp.asarray(rng.normal(size=10))
    Y = jnp.asarray(rng.normal(size=10))
    lp = np.asarray(lik.log_prob(lik.constrain(raw), F, Y))
    expected = st.norm(loc=np.asarray(F), scale=1.0).logpdf(np.asarray(Y))
    np.testing.assert_allclose(lp, expected, rtol=1e-8)


def test_poisson_logprob_vs_scipy():
    lik = gp_likelihood_crosswalk("poisson")
    F = jnp.asarray(rng.normal(size=10))
    Y = jnp.asarray(rng.poisson(3.0, size=10).astype(float))
    lp = np.asarray(lik.log_prob(jnp.zeros(0), F, Y))
    expected = st.poisson(np.exp(np.asarray(F))).logpmf(np.asarray(Y))
    np.testing.assert_allclose(lp, expected, rtol=1e-7)


def test_negative_binomial_logprob_vs_scipy():
    """NB pmf with alpha dispersion (likelihoods.py:68-79):
    r = 1/alpha, p_success = r/(m+r)."""
    alpha = 0.7
    m = np.exp(rng.normal(size=12))
    Y = rng.poisson(3.0, size=12).astype(float)
    lp = np.asarray(nb_log_prob(jnp.asarray(m), jnp.asarray(Y), alpha))
    r = 1.0 / alpha
    expected = st.nbinom(n=r, p=r / (m + r)).logpmf(Y)
    np.testing.assert_allclose(lp, expected, rtol=1e-7)


def test_bernoulli_probit_logprob():
    lik = gp_likelihood_crosswalk("bernoulli")
    F = jnp.asarray(rng.normal(size=10))
    Y = jnp.asarray((rng.random(10) > 0.5).astype(float))
    lp = np.asarray(lik.log_prob(jnp.zeros(0), F, Y))
    p = st.norm.cdf(np.asarray(F))
    expected = np.where(np.asarray(Y) > 0.5, np.log(p), np.log(1 - p))
    np.testing.assert_allclose(lp, expected, rtol=1e-6)


def test_zinb_logprob_matches_reference_formula():
    """ZINB with Michaelis-Menten zero-inflation (likelihoods.py:111-129)."""
    lik = gp_likelihood_crosswalk("zeroinflated_negativebinomial")
    alpha, km = 0.5, 2.0
    p = jnp.asarray([alpha, km])
    F = jnp.asarray(rng.normal(size=20))
    Y = jnp.asarray(np.where(rng.random(20) < 0.3, 0.0,
                             rng.poisson(4.0, 20)).astype(float))
    lp = np.asarray(lik.log_prob(p, F, Y))
    m = np.exp(np.asarray(F))
    psi = 1.0 - m / (km + m)
    r = 1.0 / alpha
    nb_all = st.nbinom(n=r, p=r / (m + r)).logpmf(np.asarray(Y))
    nb_zero = st.nbinom(n=r, p=r / (m + r)).logpmf(0.0)
    expected = np.where(
        np.asarray(Y) == 0,
        np.logaddexp(np.log(psi), np.log1p(-psi) + nb_zero),
        np.log1p(-psi) + nb_all,
    )
    np.testing.assert_allclose(lp, expected, rtol=1e-6)


def test_quadrature_matches_closed_forms():
    """GH quadrature variational expectations == closed forms where GPflow
    has them (gaussian, poisson)."""
    Fmu = jnp.asarray(rng.normal(size=15))
    Fvar = jnp.asarray(np.abs(rng.normal(size=15)) * 0.5 + 0.01)

    g = gp_likelihood_crosswalk("gaussian")
    pg = g.constrain(g.init_raw())
    Y = jnp.asarray(rng.normal(size=15))
    closed = np.asarray(g.variational_expectations(pg, Fmu, Fvar, Y))
    quad = np.asarray(
        gauss_hermite(lambda f: g.log_prob(pg, f, Y[..., None]), Fmu, Fvar)
    )
    np.testing.assert_allclose(quad, closed, rtol=1e-6)

    p_ = gp_likelihood_crosswalk("poisson")
    Yp = jnp.asarray(rng.poisson(2.0, 15).astype(float))
    closed = np.asarray(p_.variational_expectations(jnp.zeros(0), Fmu, Fvar,
                                                    Yp))
    quad = np.asarray(
        gauss_hermite(lambda f: p_.log_prob(jnp.zeros(0), f, Yp[..., None]),
                      Fmu, Fvar)
    )
    np.testing.assert_allclose(quad, closed, rtol=1e-5)


def test_predict_log_density_gaussian_closed_form():
    g = gp_likelihood_crosswalk("gaussian")
    pg = g.constrain(g.init_raw())
    Fmu = jnp.asarray(rng.normal(size=10))
    Fvar = jnp.asarray(np.abs(rng.normal(size=10)) + 0.1)
    Y = jnp.asarray(rng.normal(size=10))
    ld = np.asarray(g.predict_log_density(pg, Fmu, Fvar, Y))
    expected = st.norm(np.asarray(Fmu),
                       np.sqrt(np.asarray(Fvar) + 1.0)).logpdf(np.asarray(Y))
    np.testing.assert_allclose(ld, expected, rtol=1e-8)


def test_predict_log_density_quadrature_poisson():
    """Quadrature predict_log_density ≈ dense numeric integration."""
    p_ = gp_likelihood_crosswalk("poisson")
    Fmu = jnp.asarray([0.5, -0.3])
    Fvar = jnp.asarray([0.2, 0.4])
    Y = jnp.asarray([2.0, 0.0])
    ld = np.asarray(p_.predict_log_density(jnp.zeros(0), Fmu, Fvar, Y))
    for i in range(2):
        fs = np.linspace(-6, 6, 4001) * math.sqrt(Fvar[i]) + Fmu[i]
        dens = st.poisson(np.exp(fs)).pmf(Y[i]) * st.norm(
            Fmu[i], math.sqrt(Fvar[i])
        ).pdf(fs)
        expected = np.log(np.trapezoid(dens, fs))
        np.testing.assert_allclose(ld[i], expected, rtol=1e-4)


def test_nb_conditional_moments():
    """mean = exp(F), var = m + m² alpha (likelihoods.py:41-57)."""
    lik = gp_likelihood_crosswalk("negative_binomial")
    p = jnp.asarray([0.5])
    F = jnp.asarray([0.0, 1.0])
    m = np.exp(np.asarray(F))
    np.testing.assert_allclose(np.asarray(lik.conditional_mean(p, F)), m)
    np.testing.assert_allclose(
        np.asarray(lik.conditional_variance(p, F)), m + m ** 2 * 0.5
    )
    # plug-in predict override (reference likelihoods.py:48-51)
    ymu, yvar = lik.predict_mean_and_var(p, F, jnp.asarray([9.9, 9.9]))
    np.testing.assert_allclose(np.asarray(ymu), m)
    np.testing.assert_allclose(np.asarray(yvar), m + m ** 2 * 0.5)


def test_gamma_exponential_ve_vs_quadrature():
    Fmu = jnp.asarray(rng.normal(size=8))
    Fvar = jnp.asarray(np.abs(rng.normal(size=8)) * 0.3 + 0.05)
    Y = jnp.asarray(np.abs(rng.normal(size=8)) + 0.5)
    for name in ["gamma", "exponential"]:
        lik = gp_likelihood_crosswalk(name)
        p = lik.constrain(lik.init_raw())
        closed = np.asarray(lik.variational_expectations(p, Fmu, Fvar, Y))
        quad = np.asarray(
            gauss_hermite(lambda f: lik.log_prob(p, f, Y[..., None]),
                          Fmu, Fvar)
        )
        np.testing.assert_allclose(quad, closed, rtol=1e-5)


def test_nb_logprob_stable_at_real_data_scale():
    """The iHMP metabolome has intensities up to ~3e10; the f32-stable
    rearrangement (Stirling-cancelled gammaln difference + softplus log
    ratios) must track the f64 naive formula at every scale, and its
    gradients must stay finite and correctly signed."""
    import jax
    from scipy.special import gammaln as sgam

    def naive64(m, Y, alpha):
        k = 1.0 / alpha
        return (sgam(k + Y) - sgam(Y + 1.0) - sgam(k)
                + Y * np.log(m / (m + k)) - k * np.log1p(m * alpha))

    for Y in [0.0, 1.0, 17.0, 99.0, 100.0, 101.0, 1e4, 1e6, 3e10]:
        for alpha in [0.01, 0.5, 2.0]:
            for mfac in [0.3, 1.0, 3.0]:
                m = max(Y, 1.0) * mfac
                got = float(nb_log_prob(
                    jnp.float32(m), jnp.float32(Y), jnp.float32(alpha)))
                want = float(naive64(m, Y, alpha))
                assert abs(got - want) / max(abs(want), 1.0) < 5e-4, (
                    Y, alpha, m, got, want)

    # gradient direction: underestimating the mean must push F up
    g = jax.grad(lambda F: nb_log_prob(
        jnp.exp(F), jnp.float32(3e10), jnp.float32(1.0)))(jnp.float32(20.0))
    assert np.isfinite(float(g)) and float(g) > 0

    # near the optimum the value is moderate (no 1e11 cancellation noise)
    v = float(nb_log_prob(jnp.float32(3e10), jnp.float32(3e10),
                          jnp.float32(1.0)))
    assert -50.0 < v < 0.0


def test_poisson_logprob_stable_at_real_data_scale():
    """Breastmilk metabolite intensities reach ~3e8; the f32-stable
    Poisson rearrangement (Stirling-cancelled gammaln, expm1 mean term)
    must track the f64 naive formula at every scale, for both the
    log-pmf (s=0) and the closed-form VE (s=Fvar/2), with finite,
    correctly-signed gradients."""
    import jax
    from scipy.special import gammaln as sgam

    from waveome_tpu.likelihoods import _p_logp, _p_ve

    def naive64(F, Y, s):
        return Y * F - np.exp(F + s) - sgam(Y + 1.0)

    for Y in [0.0, 1.0, 17.0, 99.0, 100.0, 101.0, 1e4, 1e6, 3e8]:
        for mfac in [0.3, 1.0, 3.0]:
            F = float(np.log(max(Y, 1.0) * mfac))
            for v in [0.0, 0.1, 1.0]:
                got = float(_p_ve((), jnp.float32(F), jnp.float32(v),
                                  jnp.float32(Y)))
                want = float(naive64(F, Y, v / 2.0))
                assert abs(got - want) / max(abs(want), 1.0) < 5e-4, (
                    Y, F, v, got, want)
            got = float(_p_logp((), jnp.float32(F), jnp.float32(Y)))
            want = float(naive64(F, Y, 0.0))
            assert abs(got - want) / max(abs(want), 1.0) < 5e-4, (
                Y, F, got, want)

    # gradient direction: underestimating the mean must push F up
    g = jax.grad(lambda F: _p_logp((), F, jnp.float32(3e8)))(
        jnp.float32(18.0))
    assert np.isfinite(float(g)) and float(g) > 0

    # near the optimum the value is moderate (no 1e9 cancellation noise)
    v = float(_p_logp((), jnp.float32(np.log(3e8)), jnp.float32(3e8)))
    assert -50.0 < v < 0.0
