"""Pallas TPU kernel: batched Cholesky factorization.

The exact-Gaussian penalized path factorizes a (B, N, N) batch of gram
matrices every objective evaluation (svgp.exact_mll; ~N=512, B=256 on the
bench workload) — the dominant stage of the hot loop (ROADMAP round-2:
~45 ms/step). XLA's cholesky on TPU serializes poorly; this kernel runs
one factorization per grid step with the whole matrix resident in VMEM
(512² f32 = 1 MB), using the classic blocked right-looking algorithm:

  per 128-wide block step:
    1. combined diag-factor + panel-solve: 128 sequential rank-1 updates
       over the (rem, 128) panel (VPU, fori_loop);
    2. trailing update  A22 -= P @ P^T  as one MXU GEMM.

Sequential work is O(N·B) steps of (rem × 128) elementwise panels; the
O(N³) bulk rides the MXU. Used FORWARD-ONLY (line-search trials) via the
same trace-time dispatch as the fused gram — gradients evaluate the XLA
cholesky, so no custom_vjp enters the vmapped while_loop (the round-2/3
NaN composition).

Verified against jnp.linalg.cholesky in tests/test_pallas_chol.py
(interpret mode on CPU, real kernel on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128


def _chol_body(a_ref, out_ref, scratch):
    """Factor one (N, N) SPD matrix; write lower-triangular L.

    The per-column recurrence is STATICALLY UNROLLED (Python range, not
    fori_loop): Mosaic has no dynamic_slice lowering for kernel values,
    and static indices compile to plain strided accesses. N <= 1024 keeps
    the unrolled program (N small vector steps + N/128 MXU GEMMs) and the
    VMEM residency reasonable.
    """
    N = scratch.shape[0]
    scratch[:, :] = a_ref[0]
    n_blocks = N // BLK

    for kb in range(n_blocks):
        o = kb * BLK
        rem = N - o
        rows = jax.lax.broadcasted_iota(jnp.int32, (rem, BLK), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (rem, BLK), 1)

        # --- 1. panel factorization (diag block + sub-diagonal solve):
        # 128 unrolled left-looking steps over the (rem, 128) panel ---
        panel = scratch[o:, o:o + BLK]
        for j in range(BLK):
            c = panel[:, j]  # static column slice
            d = jnp.maximum(panel[j, j], 1e-30)
            lcol = jnp.where(rows[:, 0] >= j, c * jax.lax.rsqrt(d), 0.0)
            # row j, zeroed at columns <= j (they are already final)
            rowj = jnp.where(cols[0] > j, panel[j, :], 0.0)
            panel = panel - (c / d)[:, None] * rowj[None, :]
            # (.at[:, j].set lowers to scatter, which Mosaic lacks)
            panel = jnp.where(cols == j, lcol[:, None], panel)
        # zero garbage above the diagonal of the block
        panel = jnp.where(rows >= cols, panel, 0.0)
        scratch[o:, o:o + BLK] = panel

        # --- 2. MXU trailing update: A22 -= P_low @ P_low^T ---
        if o + BLK < N:
            p_low = scratch[o + BLK:, o:o + BLK]  # (rem-BLK, BLK)
            scratch[o + BLK:, o + BLK:] = (
                scratch[o + BLK:, o + BLK:]
                - jnp.dot(p_low, p_low.T,
                          preferred_element_type=jnp.float32)
            )

    # zero the strictly-upper triangle of the full matrix
    rN = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    cN = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    out_ref[0] = jnp.where(rN >= cN, scratch[:, :], 0.0)


@functools.partial(jax.jit, static_argnums=(1,))
def _chol_impl(A, interpret):
    B, N, _ = A.shape
    return pl.pallas_call(
        _chol_body,
        out_shape=jax.ShapeDtypeStruct((B, N, N), A.dtype),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, N, N), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, N, N), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((N, N), A.dtype)],
        interpret=interpret,
    )(A)


def cholesky_pallas(A, interpret=None):
    """Lower Cholesky of a (..., N, N) SPD batch.

    N is padded up to a 128 multiple with an identity bottom-right block
    (chol of blockdiag(K, I) = blockdiag(L, I)), so any N works.
    Forward-only — no differentiation rule; the dispatch (models/svgp.py
    ``_chol``) only routes trial evaluations here.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    batch_shape = A.shape[:-2]
    N = A.shape[-1]
    A3 = A.reshape((-1, N, N)) if batch_shape != () else A[None]
    pad = (-N) % BLK
    if pad:
        Np = N + pad
        A3 = (
            jnp.zeros((A3.shape[0], Np, Np), A.dtype)
            .at[:, :N, :N].set(A3)
            .at[:, N:, N:].set(jnp.eye(pad, dtype=A.dtype))
        )
    L = _chol_impl(A3, interpret)
    if pad:
        L = L[:, :N, :N]
    return L.reshape(batch_shape + (N, N)) if batch_shape != () else L[0]


def chol_supported(N: int) -> bool:
    """VMEM-resident sizes only (3 full copies of the padded matrix)."""
    return BLK <= N <= 1024


# ---------------------------------------------------------------------------
# Lane-batched hybrid Cholesky (round-3 redesign)
#
# The grid-sequential kernel above is overhead-bound: each grid step
# serializes 128 tiny (rem, 128) vector steps for ONE batch member while
# the other B-1 wait. The hybrid flips the layout: the only inherently
# sequential piece — factorizing the 128x128 diagonal block — runs in a
# Pallas kernel with the BATCH on the 128-lane axis, so every one of the
# 128 sequential column steps advances LT batch members simultaneously on
# the VPU. Everything else (panel solve against the in-kernel-computed
# inverse, trailing A22 -= P P^T update) is O(N^3) MXU work expressed as
# XLA batched GEMMs BETWEEN the Pallas calls, where XLA's batching is
# already optimal. The block loop is unrolled at trace level (N/128
# steps, static shapes, one kernel compilation reused by every step).
# ---------------------------------------------------------------------------

LT = 64  # lane tile: (128, 128, LT) f32 x 3 buffers = 12 MB VMEM


def _diag_factor_body(d_ref, l_ref, inv_ref):
    """Factor LT diagonal blocks at once: D -> (L, L^-1).

    ``d_ref``: (BLK, BLK, LT) — rows x cols x batch-on-lanes. Phase 1 is
    the unblocked right-looking recurrence, one column per static step,
    vectorized over the lane (batch) axis; phase 2 computes L^-1 by row
    forward-substitution (the full-sum trick: L's upper triangle is
    already zeroed and X rows >= r are still zero, so no k<r mask is
    needed). Static unroll throughout — Mosaic has no dynamic_slice on
    kernel values; ``jnp.where`` masks stand in for column writes.
    """
    nb, _, lt = d_ref.shape
    S = d_ref[:, :, :]
    rows3 = jax.lax.broadcasted_iota(jnp.int32, (nb, nb, lt), 0)
    cols3 = jax.lax.broadcasted_iota(jnp.int32, (nb, nb, lt), 1)
    rowsv = jax.lax.broadcasted_iota(jnp.int32, (nb, lt), 0)

    # --- phase 1: factor ---
    for j in range(nb):
        d = jnp.maximum(S[j, j, :], 1e-30)          # (LT,)
        c = S[:, j, :]                              # (BLK, LT)
        lcol = jnp.where(rowsv >= j, c * jax.lax.rsqrt(d)[None, :], 0.0)
        # row j scaled by 1/d, zeroed at cols <= j (already final)
        rowj = jnp.where(rowsv > j, S[j, :, :] / d[None, :], 0.0)
        S = S - c[:, None, :] * rowj[None, :, :]
        S = jnp.where(cols3 == j, lcol[:, None, :], S)
    S = jnp.where(rows3 >= cols3, S, 0.0)
    l_ref[:, :, :] = S

    # --- phase 2: invert L by rows ---
    X = jnp.zeros((nb, nb, lt), S.dtype)
    for r in range(nb):
        acc = jnp.sum(S[r, :, :][:, None, :] * X, axis=0)   # (BLK, LT)
        e_r = jnp.where(rowsv == r, 1.0, 0.0)               # (BLK, LT)
        xrow = (e_r - acc) / jnp.maximum(S[r, r, :], 1e-30)[None, :]
        X = jnp.where(rows3 == r, xrow[None, :, :], X)
    inv_ref[:, :, :] = X


@functools.partial(jax.jit, static_argnums=(1, 2))
def _diag_factor_impl(Dt, lt, interpret):
    nb, _, Bp = Dt.shape
    spec = pl.BlockSpec((nb, nb, lt), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _diag_factor_body,
        out_shape=(jax.ShapeDtypeStruct(Dt.shape, Dt.dtype),
                   jax.ShapeDtypeStruct(Dt.shape, Dt.dtype)),
        grid=(Bp // lt,),
        in_specs=[spec],
        out_specs=(spec, spec),
        interpret=interpret,
    )(Dt)


def _diag_factor(D, interpret):
    """(B, nb, nb) diag blocks -> (L, L^-1), batch on lanes inside."""
    B, nb, _ = D.shape
    lt = min(LT, B) if B % min(LT, B) == 0 else LT
    pad_b = (-B) % lt
    Dt = jnp.transpose(D, (1, 2, 0))                # (nb, nb, B)
    if pad_b:
        Dt = jnp.pad(Dt, ((0, 0), (0, 0), (0, pad_b)))
    L_t, inv_t = _diag_factor_impl(Dt, lt, interpret)
    if pad_b:
        L_t, inv_t = L_t[:, :, :B], inv_t[:, :, :B]
    return jnp.transpose(L_t, (2, 0, 1)), jnp.transpose(inv_t, (2, 0, 1))


def _diag_factor_xla(D):
    """XLA reference path for the same block step (A/B harness)."""
    L = jnp.linalg.cholesky(D)
    eye = jnp.broadcast_to(jnp.eye(D.shape[-1], dtype=D.dtype), D.shape)
    inv = jax.lax.linalg.triangular_solve(
        L, eye, left_side=True, lower=True)
    return L, inv


def cholesky_hybrid(A, diag_impl: str = "pallas", interpret=None,
                    blk: int = BLK):
    """Lower Cholesky of a (..., N, N) SPD batch, hybrid blocked form.

    Per 128-block step: lane-batched Pallas diag factor+inverse, then the
    panel solve L21 = A21 @ (L11^-1)^T and trailing update
    A22 -= L21 L21^T as XLA batched GEMMs (MXU). ``diag_impl='xla'``
    swaps the Pallas call for jnp.linalg.cholesky + triangular_solve to
    isolate the kernel's contribution. ``blk`` shrinks the block size for
    CPU interpret-mode tests (the 2*blk-step unrolled kernel body is
    minutes of XLA-CPU compile at blk=128; production TPU always uses
    128 and is chip-verified in tools/chol_bench.py).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    batch_shape = A.shape[:-2]
    N = A.shape[-1]
    A3 = A.reshape((-1, N, N)) if batch_shape != () else A[None]
    pad = (-N) % blk
    Np = N + pad
    if pad:
        A3 = (
            jnp.zeros((A3.shape[0], Np, Np), A.dtype)
            .at[:, :N, :N].set(A3)
            .at[:, N:, N:].set(jnp.eye(pad, dtype=A.dtype))
        )
    L = jnp.zeros_like(A3)
    for o in range(0, Np, blk):
        D = A3[:, o:o + blk, o:o + blk]
        if diag_impl == "pallas":
            L11, inv11 = _diag_factor(D, interpret)
        else:
            L11, inv11 = _diag_factor_xla(D)
        L = L.at[:, o:o + blk, o:o + blk].set(L11)
        if o + blk < Np:
            A21 = A3[:, o + blk:, o:o + blk]
            P = jnp.einsum("brk,bjk->brj", A21, inv11)
            L = L.at[:, o + blk:, o:o + blk].set(P)
            A3 = A3.at[:, o + blk:, o + blk:].add(
                -jnp.einsum("brk,bsk->brs", P, P))
    if pad:
        L = L[:, :N, :N]
    return L.reshape(batch_shape + (N, N)) if batch_shape != () else L[0]
