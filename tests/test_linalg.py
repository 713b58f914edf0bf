"""Blocked right-looking Cholesky (linalg.py) vs XLA native — the search
hot loop's factorization. Equivalence must hold on ill-conditioned fit
grams (K + small sigma^2 I), the regime that broke the rejected Pallas
hybrid (pallas_ops/chol_pallas.py STATUS note)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveome_tpu.linalg import _BLOCKED_MIN, blocked_cholesky, cholesky


def _spd_batch(N, B=3, noise=0.05, seed=0):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.normal(size=N))
    K = np.exp(-0.5 * (x[:, None] - x[None, :]) ** 2 / 0.3 ** 2)
    return jnp.asarray(
        np.stack([K + (noise + 0.1 * i) * np.eye(N) for i in range(B)]),
        jnp.float32,
    )


@pytest.mark.parametrize("N", [130, 256, 500])
def test_blocked_matches_native(N):
    K = _spd_batch(N)
    Lb = blocked_cholesky(K)
    Ln = jnp.linalg.cholesky(K)
    # logdet — the quantity the MLL consumes
    ld_b = 2 * jnp.sum(jnp.log(jnp.diagonal(Lb, axis1=-2, axis2=-1)), -1)
    ld_n = 2 * jnp.sum(jnp.log(jnp.diagonal(Ln, axis1=-2, axis2=-1)), -1)
    np.testing.assert_allclose(np.asarray(ld_b), np.asarray(ld_n),
                               rtol=1e-5)
    # reconstruction
    rec = jnp.einsum("bik,bjk->bij", Lb, Lb)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(K), atol=5e-3)
    # strictly lower-triangular output (pad tail sliced away)
    assert np.allclose(np.asarray(Lb), np.tril(np.asarray(Lb)))


def test_blocked_vmap_and_grad():
    K = _spd_batch(300, B=4)

    def logdet_b(a):
        L = blocked_cholesky(a)
        return 2 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)))

    def logdet_n(a):
        L = jnp.linalg.cholesky(a)
        return 2 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)))

    Lv = jax.vmap(blocked_cholesky)(K)
    np.testing.assert_allclose(np.asarray(Lv),
                               np.asarray(blocked_cholesky(K)), rtol=1e-6)
    gb = jax.grad(logdet_b)(K[0])
    gn = jax.grad(logdet_n)(K[0])
    # d logdet / dK = K^-1 (symmetrized by autodiff) — compare directly
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gn),
                               rtol=1e-3, atol=1e-3)


def test_auto_dispatch_gate():
    # CPU test env: auto mode keeps native everywhere
    K = _spd_batch(max(_BLOCKED_MIN, 256))
    np.testing.assert_allclose(np.asarray(cholesky(K)),
                               np.asarray(jnp.linalg.cholesky(K)),
                               rtol=1e-6)
