"""Pallas batched Cholesky kernel: correctness vs jnp.linalg.cholesky
(interpret mode on CPU; the same kernel body runs compiled on TPU —
measured there in tools/chol_bench.py)."""

import numpy as np
import jax.numpy as jnp

from waveome_tpu.pallas_ops.chol_pallas import (
    chol_supported,
    cholesky_hybrid,
    cholesky_pallas,
)


def test_cholesky_pallas_matches_xla():
    """Grid-sequential kernel, N=128 (one block) ONLY: the statically
    unrolled body is a huge XLA-CPU graph in interpret mode — the N=140
    padded variant compiles a 2-block 256-wide body (~5 min cold), not
    worth it for an opt-in research kernel. Padding logic is shared
    with (and covered by) the hybrid blk=8 test below; the production
    N=500 shape is chip-verified in tools/chol_bench.py."""
    rng = np.random.default_rng(0)
    B, N = 3, 128
    A = rng.normal(size=(B, N, N)).astype(np.float32)
    K = A @ np.transpose(A, (0, 2, 1)) + N * np.eye(N, dtype=np.float32)
    L = np.asarray(cholesky_pallas(jnp.asarray(K)))
    want = np.linalg.cholesky(K)
    assert np.max(np.abs(L - want)) / np.max(np.abs(want)) < 1e-4
    # strictly lower triangular output
    assert np.allclose(np.triu(L, 1), 0.0)


def test_chol_supported_bounds():
    assert chol_supported(500) and chol_supported(1024)
    assert not chol_supported(64) and not chol_supported(2048)


def test_cholesky_hybrid_xla_blocks():
    """Trace-level blocked driver math (panel solve + trailing update)
    against plain XLA cholesky, using the XLA diag-factor path so the
    test runs at production-like sizes on CPU."""
    rng = np.random.default_rng(2)
    for B, N in ((4, 256), (3, 200)):
        A = rng.normal(size=(B, N, N)).astype(np.float32)
        K = A @ np.transpose(A, (0, 2, 1)) + N * np.eye(N,
                                                        dtype=np.float32)
        L = np.asarray(cholesky_hybrid(jnp.asarray(K), diag_impl="xla"))
        want = np.asarray(jnp.linalg.cholesky(jnp.asarray(K)))
        assert (np.max(np.abs(L - want)) / np.max(np.abs(want))) < 2e-5
        assert np.allclose(np.triu(L, 1), 0.0)


def test_cholesky_hybrid_pallas_lane_batched():
    """Lane-batched diag factor+inverse kernel (interpret mode): tiny
    blk — interpret executes each unrolled step eagerly at ~0.1 s/step,
    so the production blk=128 shape is chip-verified in
    tools/chol_bench.py instead."""
    rng = np.random.default_rng(3)
    B, N = 2, 20  # pads N 20 -> 24 and exercises 3 block steps
    A = rng.normal(size=(B, N, N)).astype(np.float32)
    K = A @ np.transpose(A, (0, 2, 1)) + N * np.eye(N, dtype=np.float32)
    L = np.asarray(cholesky_hybrid(jnp.asarray(K), diag_impl="pallas",
                                   blk=8))
    want = np.asarray(jnp.linalg.cholesky(jnp.asarray(K)))
    assert (np.max(np.abs(L - want)) / np.max(np.abs(want))) < 1e-5
    # unbatched (rank-2) input goes through the same wrapper
    L0 = np.asarray(cholesky_hybrid(jnp.asarray(K[0]),
                                    diag_impl="pallas", blk=8))
    assert np.allclose(L0, want[0], atol=1e-4)


def test_cholesky_auto_collapses_nested_vmaps(monkeypatch):
    """cholesky_auto's custom_vmap rule must flatten EVERY vmap level
    into the kernel's lane batch (the production drivers nest
    trials x outcomes); unbatched calls stay on XLA. blk is shrunk so
    interpret mode stays fast — the production blk=48 auto path is
    chip-verified in tools/chol_bench.py."""
    import jax
    import waveome_tpu.pallas_ops.chol_pallas as cp

    monkeypatch.setattr(cp, "_AUTO_BLK", 8)
    rng = np.random.default_rng(4)
    B1, B2, N = 3, 2, 20
    A = rng.normal(size=(B1, B2, N, N)).astype(np.float32)
    K = A @ np.swapaxes(A, -1, -2) + N * np.eye(N, dtype=np.float32)
    L = np.asarray(jax.vmap(jax.vmap(cp.cholesky_auto))(jnp.asarray(K)))
    want = np.linalg.cholesky(K)
    assert np.max(np.abs(L - want)) / np.max(np.abs(want)) < 1e-5
    # unbatched call keeps XLA's cholesky exactly
    L0 = np.asarray(cp.cholesky_auto(jnp.asarray(K[0, 0])))
    np.testing.assert_allclose(
        L0, np.asarray(jnp.linalg.cholesky(jnp.asarray(K[0, 0]))))
