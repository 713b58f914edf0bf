"""Prior log-pdf tests.

The horseshoe test validates the TFP-approximation implementation against
direct numerical integration of the scale-mixture definition
p(x; s) = ∫ N(x; 0, s²λ²) · 2/(π(1+λ²)) dλ — the same density
tfd.Horseshoe approximates (used by model_classes.py:857-859).
"""

import numpy as np
import scipy.integrate as si
import scipy.stats as st
import jax.numpy as jnp

from waveome_tpu.priors import (
    gamma_log_prob,
    horseshoe_log_prob,
    laplace_log_prob,
    normal_log_prob,
    uniform_log_prob,
)


def _horseshoe_density_numeric(x, scale):
    def integrand(lam):
        return (
            st.norm(0.0, scale * lam).pdf(x) * 2.0 / (np.pi * (1 + lam ** 2))
        )

    val, _ = si.quad(integrand, 0, np.inf, limit=200)
    return val


def test_horseshoe_matches_numeric_integration():
    for scale in [0.5, 1.0, 2.0]:
        for x in [0.05, 0.3, 1.0, 3.0, 10.0]:
            got = float(horseshoe_log_prob(jnp.asarray(x), scale))
            expected = np.log(_horseshoe_density_numeric(x, scale))
            # TFP's approximation is accurate to ~1e-3 relative in log space
            np.testing.assert_allclose(got, expected, rtol=2e-2, atol=2e-2)


def test_horseshoe_symmetry_and_shapes():
    x = jnp.asarray([0.5, -0.5])
    lp = np.asarray(horseshoe_log_prob(x, 1.0))
    np.testing.assert_allclose(lp[0], lp[1], rtol=1e-12)
    arr = horseshoe_log_prob(jnp.ones((3, 4)), 0.1)
    assert arr.shape == (3, 4)


def test_laplace_vs_scipy():
    x = np.linspace(-3, 3, 7)
    got = np.asarray(laplace_log_prob(jnp.asarray(x), 0.0, 0.7))
    np.testing.assert_allclose(got, st.laplace(0, 0.7).logpdf(x), rtol=1e-8)


def test_uniform():
    got = np.asarray(uniform_log_prob(jnp.asarray([0.5, 20.0]), 0.0, 10.0))
    np.testing.assert_allclose(got[0], -np.log(10.0))
    assert got[1] == -np.inf


def test_gamma_vs_scipy():
    x = np.asarray([0.1, 1.0, 5.0])
    got = np.asarray(gamma_log_prob(jnp.asarray(x), 2.0, 2.0))
    np.testing.assert_allclose(
        got, st.gamma(a=2.0, scale=0.5).logpdf(x), rtol=1e-8
    )


def test_normal_vs_scipy():
    x = np.asarray([-1.0, 0.0, 2.0])
    got = np.asarray(normal_log_prob(jnp.asarray(x), 0.5, 1.5))
    np.testing.assert_allclose(got, st.norm(0.5, 1.5).logpdf(x), rtol=1e-8)
