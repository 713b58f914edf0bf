"""Blocked Cholesky: the search/fit hot loop's factorization, MXU-routed.

XLA's native batched Cholesky on TPU runs the whole factorization in its
serial panel algorithm — measured 0.07 TFLOP/s at the production shape
(B=128, N=500 f32; tools/chol_blocked_bench.py, chained-sync timing). The
classic blocked right-looking form keeps only the BLK-sized diagonal
factors on that path and moves ~(1 - (BLK/N)) of the flops into batched
triangular solves and GEMM trailing updates — MXU work. Measured 4.3x
faster forward at the production shape, logdet agreement to ~2e-5
relative on ill-conditioned RBF grams (K + sigma^2 I, sigma^2 >= 0.05).

Unlike the REJECTED Pallas lane-batched hybrid
(pallas_ops/chol_pallas.py STATUS note), the panel step here is a
backward-stable batched TRSM — no explicit inverse, no cond(L11)
amplification. It is plain XLA: differentiable (the while-free Python
block loop unrolls at trace time), vmappable, shardable.

Used by models/svgp.py for every N >= _BLOCKED_MIN factorization on the
TPU path; CPU/f64 parity mode keeps jnp.linalg.cholesky. Reference
parity: this replaces tf.linalg.cholesky inside the reference's
training_loss evaluations (model_classes.py via gpflow) — an execution
strategy, not a semantic change.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_BLK = 128
# below this the single native factorization wins (one panel anyway)
_BLOCKED_MIN = 2 * _BLK


def _blocked_cholesky_fwd_impl(A, blk: int = _BLK):
    """Lower Cholesky of one (N, N) SPD matrix, right-looking blocked.

    Written unbatched so callers vmap it (the block loop is static
    Python; under vmap each per-block op becomes one batched op — the
    trailing updates batch into (B, rem, rem) GEMMs on the MXU). N is
    padded up to a block multiple with an identity tail; the pad rows
    are sliced away, so downstream logdet/solves see exactly (N, N).
    """
    N = A.shape[-1]
    pad = (-N) % blk
    Np = N + pad
    if pad:
        A = (
            jnp.zeros(A.shape[:-2] + (Np, Np), A.dtype)
            .at[..., :N, :N].set(A)
            .at[..., N:, N:].set(jnp.eye(pad, dtype=A.dtype))
        )
    # HIGHEST matmul precision is load-bearing: TPU f32 matmuls default
    # to bf16-pass arithmetic, and ~1e-3 GEMM/TRSM noise in the Schur
    # complement surfaced as non-monotone line-search values ->
    # premature L-BFGS convergence (chip A/B: iters 42 -> 23, losses
    # ~1 NLL worse). HIGHEST costs ~2x on these GEMMs and restores true
    # f32 forward error.
    with jax.default_matmul_precision("highest"):
        L = jnp.zeros_like(A)
        for o in range(0, Np, blk):
            D = A[..., o:o + blk, o:o + blk]
            L11 = jnp.linalg.cholesky(D)
            L = L.at[..., o:o + blk, o:o + blk].set(L11)
            if o + blk < Np:
                A21 = A[..., o + blk:, o:o + blk]  # (rem, blk)
                # P L11^T = A21  ->  L11 P^T = A21^T (batched TRSM)
                P = jax.scipy.linalg.solve_triangular(
                    L11, jnp.swapaxes(A21, -1, -2), lower=True)
                P = jnp.swapaxes(P, -1, -2)
                L = L.at[..., o + blk:, o:o + blk].set(P)
                # trailing symmetric update: the MXU GEMM carrying most
                # of the factorization's flops
                A = A.at[..., o + blk:, o + blk:].add(
                    -P @ jnp.swapaxes(P, -1, -2))
    if pad:
        L = L[..., :N, :N]
    return L


@jax.custom_vjp
def blocked_cholesky(A):
    """``_blocked_cholesky_fwd_impl`` with a STABLE custom pullback.

    Naive autodiff through the block recursion (chained TRSM VJPs +
    trailing-update accumulation) loses ~4 digits on ill-conditioned fit
    grams (measured 6e-2 relative gradient error vs native's 6e-6 at
    N=300, sigma^2=0.05). The custom backward instead applies the
    closed-form Cholesky pullback (Murray 2016, the same formula XLA's
    native backward uses) to the blocked L:
        P = Phi(L^T Lbar),  Abar = L^{-T} (P + P^T)/2 L^{-1}
    with Phi = tril with halved diagonal — two triangular solves + GEMMs,
    numerically identical to differentiating the native factorization.
    """
    return _blocked_cholesky_fwd_impl(A)


def _blocked_cholesky_fwd(A):
    L = _blocked_cholesky_fwd_impl(A)
    return L, L


def _blocked_cholesky_bwd(L, Lbar):
    with jax.default_matmul_precision("highest"):
        M = jnp.swapaxes(L, -1, -2) @ Lbar
        # Phi: strict lower triangle + half the diagonal
        P = jnp.tril(M, -1) + 0.5 * (
            jnp.eye(L.shape[-1], dtype=L.dtype)
            * jnp.diagonal(M, axis1=-2, axis2=-1)[..., None, :]
        )
        S = 0.5 * (P + jnp.swapaxes(P, -1, -2))
        # Abar = L^{-T} S L^{-1}: solve L^T X = S, then (L^T Abar^T) = X^T
        X = jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(L, -1, -2), S, lower=False)
        Abar = jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(L, -1, -2), jnp.swapaxes(X, -1, -2), lower=False)
    return (jnp.swapaxes(Abar, -1, -2),)


blocked_cholesky.defvjp(_blocked_cholesky_fwd, _blocked_cholesky_bwd)


def _use_blocked(N: int, dtype) -> bool:
    mode = os.environ.get("WAVEOME_BLOCKED_CHOL", "auto")
    if mode == "0":
        return False
    if N < _BLOCKED_MIN or dtype != jnp.float32:
        return False
    if mode == "1":
        return True
    # auto: only where it was measured to win (the TPU MXU path);
    # CPU keeps LAPACK
    return jax.default_backend() in ("tpu", "axon")


def cholesky(K):
    """Lower Cholesky of (..., N, N): blocked on the TPU f32 path for
    N >= _BLOCKED_MIN, XLA native otherwise."""
    if _use_blocked(K.shape[-1], K.dtype):
        return blocked_cholesky(K)
    return jnp.linalg.cholesky(K)
