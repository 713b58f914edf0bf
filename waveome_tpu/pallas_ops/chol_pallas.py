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
