"""Pallas TPU kernel: batched Cholesky factorization.

The exact-Gaussian penalized path factorizes a (B, N, N) batch of gram
matrices every objective evaluation (svgp.exact_mll; ~N=512, B=256 on
the bench workload). Both kernels here are RESEARCH ARTIFACTS, opt-in
via WAVEOME_PALLAS_CHOL=1 — end-to-end and accuracy measurements (see
``cholesky_auto``'s status note) showed XLA's batched cholesky is both
faster in the full program and backward-stable where the hybrid's
explicit-inverse panels are not. This first kernel runs
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

# Mosaic requires a block's last dim to be 128-divisible (or the full
# array dim), so the lane (batch) tile is 128; the diag block is 48x48 to
# fit VMEM: the three (HBLK, HBLK, 128) f32 buffers are 1.1 MB each, and
# the automatic grid double-buffering plus the two in-kernel working
# values (S, X) put a 64-block variant 2.1 MB over the 16 MB scoped
# limit (chip-measured).
LT = 128
HBLK = 48


def _diag_factor_body(d_ref, l_ref, inv_ref):
    """Factor LT diagonal blocks at once: D -> (L, L^-1).

    ``d_ref``: (HBLK, HBLK, LT) — rows x cols x batch-on-lanes. Phase 1
    is the unblocked right-looking recurrence, one column per static
    step, vectorized over the lane (batch) axis; phase 2 computes L^-1
    by row forward-substitution (the full-sum trick: L's upper triangle
    is already zeroed and X rows >= r are still zero, so no k<r mask is
    needed). Static unroll throughout — Mosaic has no dynamic_slice on
    kernel values; ``jnp.where`` masks stand in for column writes. Masks
    are 2D iotas broadcast over lanes (3D iota values would be
    block-sized VMEM residents).
    """
    nb, _, lt = d_ref.shape
    S = d_ref[:, :, :]
    r2 = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)[:, :, None]
    c2 = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)[:, :, None]
    rv = jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0)  # (nb, 1)

    # --- phase 1: factor ---
    for j in range(nb):
        d = jnp.maximum(S[j, j, :], 1e-30)          # (LT,)
        c = S[:, j, :]                              # (HBLK, LT)
        lcol = jnp.where(rv >= j, c * jax.lax.rsqrt(d)[None, :], 0.0)
        # row j scaled by 1/d, zeroed at cols <= j (already final);
        # rv's iota indexes the column axis of the (HBLK, LT) row here
        rowj = jnp.where(rv > j, S[j, :, :] / d[None, :], 0.0)
        S = S - c[:, None, :] * rowj[None, :, :]
        S = jnp.where(c2 == j, lcol[:, None, :], S)
    S = jnp.where(r2 >= c2, S, 0.0)
    l_ref[:, :, :] = S

    # --- phase 2: invert L by rows ---
    X = jnp.zeros((nb, nb, lt), S.dtype)
    for r in range(nb):
        acc = jnp.sum(S[r, :, :][:, None, :] * X, axis=0)   # (HBLK, LT)
        e_r = jnp.where(rv == r, 1.0, 0.0)                  # (nb, 1)
        xrow = (e_r - acc) / jnp.maximum(S[r, r, :], 1e-30)[None, :]
        X = jnp.where(r2 == r, xrow[None, :, :], X)
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
    """(B, nb, nb) diag blocks -> (L, L^-1), batch on lanes inside.

    B <= LT runs as one full-width grid step (Mosaic allows a last block
    dim equal to the array dim); larger batches pad to an LT multiple and
    tile the lane axis over the grid."""
    B, nb, _ = D.shape
    lt = B if (B <= LT or interpret) else LT
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
                    blk: int = HBLK, refine: int = 1):
    """Lower Cholesky of a (..., N, N) SPD batch, hybrid blocked form.

    Per block step: lane-batched Pallas diag factor+inverse, then the
    panel solve L21 = A21 @ (L11^-1)^T and trailing update
    A22 -= L21 L21^T as XLA batched GEMMs (MXU). ``diag_impl='xla'``
    swaps the Pallas call for jnp.linalg.cholesky + triangular_solve to
    isolate the kernel's contribution. ``blk`` shrinks the block size for
    CPU interpret-mode tests (the 2*blk-step unrolled kernel body is
    minutes of XLA-CPU compile at blk=128; production TPU always uses
    HBLK and is chip-verified in tools/chol_bench.py).

    ``refine``: rounds of GEMM-based iterative refinement of each panel
    solve (P += (A21 - P L11ᵀ) inv11ᵀ). The explicit-inverse solve alone
    has error ~cond(L11)·eps — fine on well-conditioned test matrices
    but catastrophic on real fit grams (K + σ²I with small σ²), where it
    was measured corrupting penalized NLLs by ~140 units. Each round
    multiplies the error by another cond·eps factor at the cost of two
    (rem, blk) GEMMs per block — negligible next to the (rem, rem)
    trailing update.
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
            for _ in range(refine):
                R = A21 - jnp.einsum("brj,bkj->brk", P, L11)
                P = P + jnp.einsum("brk,bjk->brj", R, inv11)
            L = L.at[:, o + blk:, o:o + blk].set(P)
            A3 = A3.at[:, o + blk:, o + blk:].add(
                -jnp.einsum("brk,bsk->brs", P, P))
    if pad:
        L = L[:, :N, :N]
    return L.reshape(batch_shape + (N, N)) if batch_shape != () else L[0]


def hybrid_supported(N: int) -> bool:
    """Any N >= HBLK (padded to an HBLK multiple); bounded so the
    trace-level block loop and GEMM temporaries stay reasonable."""
    return HBLK <= N <= 2048


# Block size used by the auto/vmapped entry below. Production is HBLK;
# tests shrink it (interpret mode executes the 2*blk-step unrolled kernel
# body eagerly — blk=48 is ~100 s/call on CPU, blk=8 is sub-second).
_AUTO_BLK = HBLK


@jax.custom_batching.custom_vmap
def _chol_hybrid_batched(K):
    """Rank-3 (B, N, N) entry: the lane-batched hybrid. Its own vmap
    rule flattens every FURTHER vmap level into the leading batch axis,
    so arbitrarily nested vmaps (trials x outcomes x restarts...) reach
    the kernel as ONE flat batch on the 128-lane axis. Without this
    recursive collapse the outer level batches the inner graph
    elementwise and XLA lays the small inner axis out on lanes —
    measured as a 32x-padded 33 GB gram intermediate (HBM OOM) on the
    bench workload."""
    return cholesky_hybrid(K, blk=_AUTO_BLK)


@_chol_hybrid_batched.def_vmap
def _chol_hybrid_batched_vmap(axis_size, in_batched, K):
    (k_batched,) = in_batched
    if not k_batched:
        return cholesky_hybrid(K, blk=_AUTO_BLK), False
    flat = K.reshape((K.shape[0] * K.shape[1],) + K.shape[2:])
    return _chol_hybrid_batched(flat).reshape(K.shape), True


@jax.custom_batching.custom_vmap
def cholesky_auto(K):
    """Cholesky that becomes the lane-batched hybrid under vmap.

    The production drivers vmap per-outcome/per-candidate programs; a
    plain pallas call inside would be batched grid-sequentially (one
    matrix per grid step — the measured-slow layout above). This
    custom_vmap rule instead hands the whole stacked batch to
    ``cholesky_hybrid`` so the batch lands on the kernel's 128-lane
    axis. Unbatched calls keep XLA's cholesky — there is no lane batch
    to exploit.

    STATUS — opt-in only (WAVEOME_PALLAS_CHOL=1), not production: the
    explicit-inverse panel solve is unstable on real fit grams
    (tools/chol_accuracy.py: logdet err 0.05-0.2 at sigma^2=1, NaN at
    sigma^2=0.09 on RBF grams; tools/chol_ab.py: premature convergence,
    +140 mean penalized NLL on the bench workload). No timing win is
    claimed: jax.block_until_ready does not synchronize on the tunneled
    backend, which invalidated the original loop-then-block microbench
    (tools/chol_bench.py now chains inputs and fetches to host).
    """
    return jnp.linalg.cholesky(K)


@cholesky_auto.def_vmap
def _cholesky_auto_vmap(axis_size, in_batched, K):
    (k_batched,) = in_batched
    if not k_batched:
        return jnp.linalg.cholesky(K), False
    return _chol_hybrid_batched(K), True
