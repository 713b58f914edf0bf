"""Pallas TPU kernel: fused sum-of-products gram assembly.

The compositional gram K = Σ_c Π_f k_cf(x, x') is the framework's
characteristic elementwise workload (every ``kernel.K`` call of the
reference, kernels.py:19-31/95-117). XLA fuses much of it, but with many
components each N×M primitive gram is a separate HBM-sized intermediate in
the worst case. This kernel tiles the output into VMEM blocks and
evaluates ALL components/factors per tile in one pass — one HBM write per
output tile, VPU-resident everything else.

The kernel body is generated from the static ``KernelSpec`` (structure
unrolled at trace time, exactly like the static-dispatch gram), with
parameters prefetched to SMEM-adjacent VMEM. Grid = (N/TN, M/TM) row/col
tiles; inputs are padded to tile multiples at the caller.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..kernels import ops
from ..kernels.gram import constrain
from ..kernels.spec import KernelSpec

TILE_N = 256
TILE_M = 256


def _factor_tile(prim, p, x1, x2):
    """One primitive's (TN, TM) tile — mirrors kernels/ops.py formulas."""
    op = prim.op
    v = p[0]
    if op == "constant":
        return jnp.full((x1.shape[0], x2.shape[0]), v, dtype=x1.dtype)
    if op == "categorical":
        eq = jnp.round(x1)[:, None] == jnp.round(x2)[None, :]
        return v * eq.astype(x1.dtype)
    if op == "linear":
        return v * (x1[:, None] * x2[None, :])
    if op == "polynomial":
        return (v * (x1[:, None] * x2[None, :]) + p[2]) ** prim.degree
    d = x1[:, None] - x2[None, :]
    if op == "squared_exponential":
        ls = jnp.maximum(p[1], 1e-10)
        return v * jnp.exp(-jnp.minimum(0.5 * d * d / (ls * ls), 80.0))
    if op == "matern12":
        ls = jnp.maximum(p[1], 1e-10)
        return v * jnp.exp(-jnp.minimum(jnp.abs(d) / ls, 80.0))
    if op == "matern32":
        r = math.sqrt(3.0) * jnp.abs(d) / jnp.maximum(p[1], 1e-10)
        return v * (1.0 + r) * jnp.exp(-jnp.minimum(r, 80.0))
    if op == "matern52":
        r = math.sqrt(5.0) * jnp.abs(d) / jnp.maximum(p[1], 1e-10)
        return v * (1.0 + r + r * r / 3.0) * jnp.exp(-jnp.minimum(r, 80.0))
    if op == "periodic":
        s = jnp.sin(math.pi * d / jnp.maximum(p[2], 1e-10)) / jnp.maximum(
            p[1], 1e-10
        )
        return v * jnp.exp(-jnp.minimum(2.0 * s * s, 80.0))
    if op == "rational_quadratic":
        ls = jnp.maximum(p[1], 1e-10)
        return v * (1.0 + d * d / (2.0 * p[2] * ls * ls)) ** (-p[2])
    raise NotImplementedError(f"pallas gram: op {op}")


def _make_kernel(spec: KernelSpec, use_mask: bool):
    spec_p = spec.padded()

    def kernel(*refs):
        if use_mask:
            x1_ref, x2_ref, params_ref, mask_ref, out_ref = refs
        else:
            x1_ref, x2_ref, params_ref, out_ref = refs
        acc = jnp.zeros((x1_ref.shape[0], x2_ref.shape[1]),
                        dtype=out_ref.dtype)
        for i, comp in enumerate(spec_p.components):
            Kc = None
            for j, prim in enumerate(comp):
                if prim.op == "empty":
                    continue
                x1 = x1_ref[:, prim.dim]
                x2 = x2_ref[prim.dim, :]
                tile = _factor_tile(prim, params_ref[i, j], x1, x2)
                Kc = tile if Kc is None else Kc * tile
            if Kc is None:
                continue
            if use_mask:
                Kc = Kc * mask_ref[0, i]
            acc = acc + Kc
        out_ref[:, :] = acc

    return kernel


def _pad_to(x, mult, axis):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnums=(0, 5))
def _gram_pallas_impl(spec, raw, X1, X2, component_mask, interpret):
    params = constrain(raw)
    N, M = X1.shape[0], X2.shape[0]
    X1p = _pad_to(X1, TILE_N, 0)
    # X2 transposed so the lane (128) dimension is the column index
    X2p = _pad_to(X2, TILE_M, 0).T  # (D, Mp)
    Np, Mp = X1p.shape[0], X2p.shape[1]
    use_mask = component_mask is not None

    grid = (Np // TILE_N, Mp // TILE_M)
    in_specs = [
        pl.BlockSpec((TILE_N, X1.shape[1]), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((X1.shape[1], TILE_M), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(params.shape, lambda i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [X1p, X2p, params]
    if use_mask:
        cm = component_mask.reshape(1, -1).astype(X1.dtype)
        in_specs.append(
            pl.BlockSpec(cm.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(cm)

    out = pl.pallas_call(
        _make_kernel(spec, use_mask),
        out_shape=jax.ShapeDtypeStruct((Np, Mp), X1.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE_N, TILE_M), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)
    return out[:N, :M]


def gram_pallas(
    spec: KernelSpec,
    raw,
    X1,
    X2=None,
    component_mask: Optional[jnp.ndarray] = None,
    interpret: Optional[bool] = None,
):
    """Drop-in fused equivalent of ``kernels.gram.gram`` (float32 TPU path).

    ``interpret`` defaults to True off-TPU so tests exercise the same
    kernel body on CPU.
    """
    if X2 is None:
        X2 = X1
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    return _gram_pallas_impl(spec, raw, X1, X2, component_mask, interpret)


# ---------------------------------------------------------------------------
# differentiable wrapper: Pallas forward + exact XLA-replay backward
# ---------------------------------------------------------------------------

_SUPPORTED_OPS = frozenset({
    "empty", "constant", "categorical", "linear", "polynomial",
    "squared_exponential", "matern12", "matern32", "matern52", "periodic",
    "rational_quadratic",
})


def spec_supported(spec: KernelSpec) -> bool:
    return all(p.op in _SUPPORTED_OPS
               for comp in spec.components for p in comp)


@functools.lru_cache(maxsize=128)
def _fused_fn(spec: KernelSpec, use_mask: bool):
    """custom_vjp gram: the Pallas kernel evaluates the forward tilewise in
    VMEM (the hot line-search path evaluates MANY more forwards than
    gradients), while the backward replays the pure-XLA gram's VJP —
    mathematically exact, no hand-written derivative kernels to drift."""
    from ..kernels.gram import gram_xla as _xla_gram

    def _primal(raw, X1, X2, component_mask):
        return gram_pallas(spec, raw, X1, X2,
                           component_mask if use_mask else None)

    @jax.custom_vjp
    def fused(raw, X1, X2, component_mask):
        return _primal(raw, X1, X2, component_mask)

    def fwd(raw, X1, X2, component_mask):
        out = _primal(raw, X1, X2, component_mask)
        return out, (raw, X1, X2, component_mask)

    def bwd(res, cot):
        raw, X1, X2, component_mask = res
        _, vjp = jax.vjp(
            lambda r: _xla_gram(spec, r, X1, X2,
                                component_mask if use_mask else None),
            raw,
        )
        (draw,) = vjp(cot)
        return (draw, jnp.zeros_like(X1), jnp.zeros_like(X2),
                jnp.zeros_like(component_mask) if use_mask else None)

    fused.defvjp(fwd, bwd)
    return fused


def gram_fused(spec: KernelSpec, raw, X1, X2=None, component_mask=None):
    """Differentiable fused gram (see _fused_fn)."""
    if X2 is None:
        X2 = X1
    fn = _fused_fn(spec, component_mask is not None)
    return fn(raw, X1, X2, component_mask)
