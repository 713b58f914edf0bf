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
import os
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
    # CRITICAL: pad the feature axis to a sublane multiple (8). Blocks
    # whose minor dim is 2..7 — e.g. (TILE_N, 2) / (2, TILE_M) for a
    # two-column design — pass the mosaic tiling check (minor dim equals
    # the array dim) but are MISCOMPILED in composition with the
    # surrounding optimizer program on the v5e: the kernel output turns
    # to garbage and every vmapped L-BFGS fit dies with a NaN first
    # post-step gradient. Root-caused by the ablation matrix in
    # tools/pallas_nan_bisect.py (round 3): D=1 healthy, D=2 reproduces,
    # zero-padding D to 8 restores losses identical to the XLA path.
    X1p = _pad_to(X1p, 8, 1)
    X2p = _pad_to(X2p, 8, 0)
    Dp = X1p.shape[1]
    Np, Mp = X1p.shape[0], X2p.shape[1]
    use_mask = component_mask is not None

    grid = (Np // TILE_N, Mp // TILE_M)
    in_specs = [
        pl.BlockSpec((TILE_N, Dp), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Dp, TILE_M), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(params.shape, lambda i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    # same skinny-minor-dim defence for the param block (C, F, 3 → C, F, 8)
    params = _pad_to(params, 8, 2)
    in_specs[2] = pl.BlockSpec(params.shape, lambda i, j: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    args = [X1p, X2p, params]
    if use_mask:
        cm = component_mask.reshape(1, -1).astype(X1.dtype)
        cm = _pad_to(cm, 8, 1)
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
    gradients); the backward is the HAND-DERIVED analytic ∂K/∂raw
    (gram_vjp_analytic — verified exact vs jax.vjp(gram_xla) in
    tests/test_pallas_gram.py). Round 2 replayed the XLA gram's VJP via a
    nested jax.vjp inside bwd; that composition produced NaN first
    post-step gradients inside the vmapped plbfgs while_loop — the
    analytic backward removes the nested-vjp structure entirely.
    Set WAVEOME_PALLAS_BWD=replay to A/B the old backward."""
    from ..kernels.gram import gram_xla as _xla_gram

    replay = os.environ.get("WAVEOME_PALLAS_BWD", "analytic") == "replay"

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
        if replay:
            _, vjp = jax.vjp(
                lambda r: _xla_gram(spec, r, X1, X2,
                                    component_mask if use_mask else None),
                raw,
            )
            (draw,) = vjp(cot)
            dmask = (jnp.zeros_like(component_mask) if use_mask else None)
        else:
            draw, dmask = gram_vjp_analytic(
                spec, raw, X1, X2,
                component_mask if use_mask else None, cot,
            )
            if use_mask and dmask is None:
                dmask = jnp.zeros_like(component_mask)
        return (draw, jnp.zeros_like(X1), jnp.zeros_like(X2),
                dmask if use_mask else None)

    fused.defvjp(fwd, bwd)
    return fused


def gram_fused(spec: KernelSpec, raw, X1, X2=None, component_mask=None):
    """Differentiable fused gram (see _fused_fn)."""
    if X2 is None:
        X2 = X1
    fn = _fused_fn(spec, component_mask is not None)
    return fn(raw, X1, X2, component_mask)


# ---------------------------------------------------------------------------
# analytic backward: hand-derived ∂K/∂raw, no nested jax.vjp
# ---------------------------------------------------------------------------

def _factor_tile_grads(prim, p, x1, x2):
    """(tile, {slot: ∂tile/∂p[slot]}) for one primitive — derivative
    formulas mirror kernels/ops.py with the same ls-floor/exp-clip safety.
    """
    op = prim.op
    v = p[0]
    dt = {}
    if op == "constant":
        t = jnp.full((x1.shape[0], x2.shape[0]), v, dtype=x1.dtype)
        dt[0] = jnp.ones_like(t)
        return t, dt
    if op == "categorical":
        eq = (jnp.round(x1)[:, None] == jnp.round(x2)[None, :]).astype(
            x1.dtype)
        return v * eq, {0: eq}
    if op == "linear":
        xx = x1[:, None] * x2[None, :]
        return v * xx, {0: xx}
    if op == "polynomial":
        xx = x1[:, None] * x2[None, :]
        base = v * xx + p[2]
        d = prim.degree
        t = base ** d
        dbase = d * base ** (d - 1)
        return t, {0: dbase * xx, 2: dbase}
    d = x1[:, None] - x2[None, :]
    if op == "squared_exponential":
        ls = jnp.maximum(p[1], 1e-10)
        u = jnp.minimum(0.5 * d * d / (ls * ls), 80.0)
        E = jnp.exp(-u)
        t = v * E
        # clipped region: du/dls = 0 there too (u constant), consistent
        dls = jnp.where(u < 80.0, t * (d * d) / (ls ** 3), 0.0)
        return t, {0: E, 1: dls}
    if op == "matern12":
        ls = jnp.maximum(p[1], 1e-10)
        r = jnp.minimum(jnp.abs(d) / ls, 80.0)
        E = jnp.exp(-r)
        t = v * E
        dls = jnp.where(r < 80.0, t * r / ls, 0.0)
        return t, {0: E, 1: dls}
    if op == "matern32":
        ls = jnp.maximum(p[1], 1e-10)
        r = math.sqrt(3.0) * jnp.abs(d) / ls
        rc = jnp.minimum(r, 80.0)
        E = jnp.exp(-rc)
        t = v * (1.0 + r) * E
        # d/dls[v(1+r)e^{-r}] with dr/dls = -r/ls  →  v r² e^{-r} / ls
        dls = jnp.where(r < 80.0, v * r * r * E / ls, 0.0)
        return t, {0: (1.0 + r) * E, 1: dls}
    if op == "matern52":
        ls = jnp.maximum(p[1], 1e-10)
        r = math.sqrt(5.0) * jnp.abs(d) / ls
        rc = jnp.minimum(r, 80.0)
        E = jnp.exp(-rc)
        f = 1.0 + r + r * r / 3.0
        t = v * f * E
        # d/dr[f e^{-r}] = -(r(1+r)/3) e^{-r}; dr/dls = -r/ls
        dls = jnp.where(r < 80.0, v * r * r * (1.0 + r) / (3.0 * ls) * E,
                        0.0)
        return t, {0: f * E, 1: dls}
    if op == "periodic":
        ls = jnp.maximum(p[1], 1e-10)
        per = jnp.maximum(p[2], 1e-10)
        ang = math.pi * d / per
        s = jnp.sin(ang) / ls
        u = jnp.minimum(2.0 * s * s, 80.0)
        E = jnp.exp(-u)
        t = v * E
        live = u < 80.0
        # du/dls = -4s²/ls ; du/dper = 4s·cos(ang)·(-π d/per²)/ls
        dls = jnp.where(live, t * 4.0 * s * s / ls, 0.0)
        dper = jnp.where(
            live,
            t * 4.0 * s * jnp.cos(ang) * math.pi * d / (per * per * ls),
            0.0,
        )
        return t, {0: E, 1: dls, 2: dper}
    if op == "rational_quadratic":
        ls = jnp.maximum(p[1], 1e-10)
        a = p[2]
        u = 1.0 + d * d / (2.0 * a * ls * ls)
        t = v * u ** (-a)
        dls = v * u ** (-a - 1.0) * (d * d) / (ls ** 3)
        da = t * (-jnp.log(u)) + v * u ** (-a - 1.0) * (d * d) / (
            2.0 * a * ls * ls)
        return t, {0: u ** (-a), 1: dls, 2: da}
    raise NotImplementedError(f"analytic gram bwd: op {op}")


def gram_vjp_analytic(spec: KernelSpec, raw, X1, X2, component_mask, cot):
    """∂⟨cot, K⟩/∂raw, hand-derived (no nested jax.vjp).

    Also returns the component-mask cotangent ⟨cot, Π_f t_cf⟩ per
    component. X1/X2 cotangents are NOT computed (the fused dispatch is
    only eligible on paths where inputs are untrained — kernels/gram.py
    _pallas_eligible excludes the trainable-Z sparse case by N >= 256).
    """
    from ..bijectors import softplus_grad

    spec_p = spec.padded()
    params = constrain(raw)
    draw = jnp.zeros_like(raw)
    dmask = ([] if component_mask is not None else None)
    for i, comp in enumerate(spec_p.components):
        tiles, grads, idxs = [], [], []
        for j, prim in enumerate(comp):
            if prim.op == "empty":
                continue
            t, dt = _factor_tile_grads(prim, params[i, j],
                                       X1[:, prim.dim], X2[:, prim.dim])
            tiles.append(t)
            grads.append(dt)
            idxs.append(j)
        if not tiles:
            if dmask is not None:
                dmask.append(jnp.zeros((), dtype=raw.dtype))
            continue
        F = len(tiles)
        # leave-one-out products via prefix/suffix (no division by zero)
        prefix = [None] * F
        suffix = [None] * F
        acc = None
        for f in range(F):
            prefix[f] = acc
            acc = tiles[f] if acc is None else acc * tiles[f]
        full = acc
        acc = None
        for f in range(F - 1, -1, -1):
            suffix[f] = acc
            acc = tiles[f] if acc is None else tiles[f] * acc
        mscale = (component_mask[i] if component_mask is not None
                  else jnp.asarray(1.0, dtype=raw.dtype))
        Gm = cot * mscale
        for f in range(F):
            loo = None
            if prefix[f] is not None:
                loo = prefix[f]
            if suffix[f] is not None:
                loo = suffix[f] if loo is None else loo * suffix[f]
            w = Gm if loo is None else Gm * loo
            for slot, dt in grads[f].items():
                draw = draw.at[i, idxs[f], slot].add(jnp.sum(w * dt))
        if dmask is not None:
            dmask.append(jnp.sum(cot * full))
    draw = draw * softplus_grad(raw)
    if dmask is not None:
        return draw, jnp.stack(dmask)
    return draw, None
