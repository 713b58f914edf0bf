"""Gram-matrix assembly: sum over components of products of primitive grams.

Replaces every ``kernel.K`` / ``K_diag`` call in the reference
(kernels.py:19-31, :95-117; gpflow Sum/Product dispatch) with two pure
functions over a static ``KernelSpec`` + dense raw parameter array.

Two evaluation modes:

* **static dispatch** (``gram``/``gram_diag``): the spec is Python-static, so
  XLA sees only the primitives actually present — fastest single-structure
  path, used by the batched penalized engine (all outcomes share the
  saturated kernel).
* **coded dispatch** (``gram_coded``/``gram_diag_coded``): structure is
  passed as `(C, F)` int arrays and each factor is a ``lax.switch`` over op
  codes — one compilation covers *every* candidate structure with the same
  padded shape, so a whole greedy-search expansion step batches into a single
  vmapped fit (replacing one L-BFGS process per candidate,
  model_search.py:2347-2558).

``component_mask`` (a length-C 0/1 vector) implements, with static shapes:
  * pruning        (model_classes.py:1029-1079),
  * leave-one-out feature importance (utilities.py:651-668),
  * per-component posteriors (utilities.py:710-974).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..bijectors import softplus
from . import ops
from .spec import KernelSpec

# Fused Pallas gram dispatch (WAVEOME_PALLAS_GRAM=1 enables): on TPU, f32,
# large-N static-structure grams route to the VMEM-tiled kernel
# (pallas_ops/gram_pallas.py — measured 1.5x over the XLA fusion at N=512;
# forward-only, gradients replay the XLA path via custom_vjp).
#
# DEFAULT OFF — root-caused in round 3 to a composition-dependent XLA
# miscompile around the pallas_call, NOT a kernel or waveome bug
# (tools/pallas_nan_bisect.py ablation matrix, v5e chip):
#   * kernel values verify exactly vs XLA standalone, under vmap, nested
#     vmap, and in a toy vmap(while_loop(trials + lax.cond(grad))) loop;
#   * the production signature (every vmapped plbfgs fit stopping at
#     iter 1 with a NaN first post-step gradient AND garbage trial
#     losses) reproduces in a ~60-line harness: vmap(plbfgs_fit) over a
#     Cholesky loss whose gram is the custom_vjp Pallas call, with a
#     MULTI-COLUMN design (D >= 2). D = 1 compiles correctly; the same
#     program with X pre-padded to 8 columns AT THE TOP LEVEL compiles
#     correctly (losses match the XLA control to 6 digits); padding to
#     8 columns INSIDE the jitted function — producing bit-identical
#     pallas operands and block shapes — still miscompiles. Two
#     programs whose pallas_call sees identical inputs, one healthy and
#     one garbage, is a compiler bug, not a kernel bug.
#   * not the backward (XLA-replay and hand-derived analytic both
#     reproduce), not the segmented driver (reproduces unsegmented),
#     not the horseshoe prior, not p0/X/y batching shape, and the
#     forward-only (no custom_vjp) dispatch is healthy on the full
#     production path — custom_vjp + multi-column design is the
#     miscompiling composition.
# Since the forward-only measurement showed XLA's fusion beating the
# standalone kernel at production shapes anyway (944 vs 1001 fits/min),
# the optimizer hot path stays on the XLA gram. Set
# WAVEOME_PALLAS_GRAM=1 to opt in for inference-style calls.
_PALLAS_GRAM = os.environ.get("WAVEOME_PALLAS_GRAM", "0") == "1"
_PALLAS_MIN_N = 256

# Trace-time forward-only dispatch: while a function wrapped in
# ``forward_pallas`` is being traced, eligible gram calls go straight to
# the Pallas kernel with NO custom_vjp wrapper. The optimizer hot loop
# evaluates 4 line-search trials (pure forwards) per single gradient, so
# routing just the trials through Pallas sidesteps the
# custom_vjp-under-vmapped-while_loop composition entirely (both the
# XLA-replay and the analytic backward reproduce the
# first-post-step-gradient NaN; see the _PALLAS_GRAM note) — verified
# healthy on chip: identical losses/iteration counts to the XLA path.
#
# DEFAULT OFF after measurement (round 3, v5e chip, bench workload
# N=500 B=256): trials-via-Pallas = 944 fits/min vs 1001 on pure XLA —
# at production shapes XLA's fusion of the elementwise gram into the
# surrounding objective beats the standalone kernel (which pays padding
# + an unfused HBM round trip). WAVEOME_PALLAS_TRIALS=1 opts in for
# large-N exact fits where VMEM tiling wins.
_PALLAS_FORWARD_CTX = False
_PALLAS_FORWARD_OFF = (
    os.environ.get("WAVEOME_PALLAS_TRIALS", "0") == "0"
)


def forward_pallas(fn):
    """Wrap ``fn`` so gram calls traced inside it use the forward-only
    Pallas dispatch (trace-time flag: the wrapped function must only be
    used where no gradients flow through it, e.g. line-search trials)."""
    def wrapped(*args, **kwargs):
        global _PALLAS_FORWARD_CTX
        old = _PALLAS_FORWARD_CTX
        _PALLAS_FORWARD_CTX = True
        try:
            return fn(*args, **kwargs)
        finally:
            _PALLAS_FORWARD_CTX = old

    return wrapped


def constrain(raw):
    """Raw (C,F,P) → constrained positive params (gpflow positive())."""
    return softplus(raw)


def _pallas_eligible(spec, X1, X2, factor_mask) -> bool:
    forward_ctx = _PALLAS_FORWARD_CTX and not _PALLAS_FORWARD_OFF
    if not (_PALLAS_GRAM or forward_ctx) or factor_mask is not None:
        return False
    if X1.dtype != jnp.float32:
        return False
    if X1.shape[0] < _PALLAS_MIN_N or X2.shape[0] < _PALLAS_MIN_N:
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    from ..pallas_ops.gram_pallas import spec_supported

    return spec_supported(spec)


# ---------------------------------------------------------------------------
# static dispatch
# ---------------------------------------------------------------------------


def gram(
    spec: KernelSpec,
    raw: jnp.ndarray,
    X1: jnp.ndarray,
    X2: Optional[jnp.ndarray] = None,
    component_mask: Optional[jnp.ndarray] = None,
    factor_mask: Optional[jnp.ndarray] = None,
):
    """Full gram matrix K(X1, X2) of shape (N1, N2).

    ``factor_mask`` (C, F) of 0/1: a masked factor contributes the
    multiplicative identity — this implements the reference's
    lengthscale-based *factor* removal inside product kernels
    (utilities.py:1156-1184) without changing shapes.
    """
    if X2 is None:
        X2 = X1
    if _pallas_eligible(spec, X1, X2, factor_mask):
        if _PALLAS_FORWARD_CTX and not _PALLAS_FORWARD_OFF:
            # forward-only context (line-search trials): bare Pallas
            # kernel, no custom_vjp — nothing differentiates through it
            from ..pallas_ops.gram_pallas import gram_pallas

            return gram_pallas(spec, raw, X1, X2, component_mask)
        from ..pallas_ops.gram_pallas import gram_fused

        return gram_fused(spec, raw, X1, X2, component_mask)
    return gram_xla(spec, raw, X1, X2, component_mask, factor_mask)


def gram_xla(
    spec: KernelSpec,
    raw: jnp.ndarray,
    X1: jnp.ndarray,
    X2: jnp.ndarray,
    component_mask: Optional[jnp.ndarray] = None,
    factor_mask: Optional[jnp.ndarray] = None,
):
    """Pure-XLA gram (no Pallas dispatch) — also the backward-pass body of
    the fused kernel's custom VJP."""
    params = constrain(raw)
    spec_p = spec.padded()
    N1, N2 = X1.shape[0], X2.shape[0]
    total = jnp.zeros((N1, N2), dtype=X1.dtype)
    for i, comp in enumerate(spec_p.components):
        Kc = None
        for j, prim in enumerate(comp):
            if prim.op == "empty":
                continue
            fn = ops.GRAM_FNS[prim.code]
            kij = fn(
                params[i, j], X1[:, prim.dim], X2[:, prim.dim],
                degree=prim.degree, order=prim.order,
            )
            if factor_mask is not None:
                kij = jnp.where(factor_mask[i, j] > 0, kij, 1.0)
            Kc = kij if Kc is None else Kc * kij
        if Kc is None:
            continue
        if component_mask is not None:
            Kc = Kc * component_mask[i]
        if factor_mask is not None:
            # a component with every factor masked contributes nothing
            Kc = Kc * jnp.max(factor_mask[i] * spec.active_factor_mask()[i])
        total = total + Kc
    return total


def gram_diag(
    spec: KernelSpec,
    raw: jnp.ndarray,
    X: jnp.ndarray,
    component_mask: Optional[jnp.ndarray] = None,
    factor_mask: Optional[jnp.ndarray] = None,
):
    """Diagonal of K(X, X), shape (N,)."""
    params = constrain(raw)
    spec_p = spec.padded()
    total = jnp.zeros((X.shape[0],), dtype=X.dtype)
    for i, comp in enumerate(spec_p.components):
        kd = None
        for j, prim in enumerate(comp):
            if prim.op == "empty":
                continue
            fn = ops.DIAG_FNS[prim.code]
            dij = fn(params[i, j], X[:, prim.dim],
                     degree=prim.degree, order=prim.order)
            if factor_mask is not None:
                dij = jnp.where(factor_mask[i, j] > 0, dij, 1.0)
            kd = dij if kd is None else kd * dij
        if kd is None:
            continue
        if component_mask is not None:
            kd = kd * component_mask[i]
        if factor_mask is not None:
            kd = kd * jnp.max(factor_mask[i] * spec.active_factor_mask()[i])
        total = total + kd
    return total


# ---------------------------------------------------------------------------
# coded dispatch (structure as data)
# ---------------------------------------------------------------------------

_N_OPS = len(ops.OP_NAMES)
_ALL_OPS = tuple(range(_N_OPS))


def _code_index(op, table):
    """Map a traced raw op code to its (static) position in ``table``."""
    if table == _ALL_OPS:
        return op
    idx = jnp.zeros_like(op)
    for i, code in enumerate(table):
        idx = jnp.where(op == code, i, idx)
    return idx


def _factor_gram(op, p, x1, x2, degree, table=_ALL_OPS):
    """lax.switch over op codes; EMPTY returns multiplicative identity.

    ``table``: static tuple of the op codes that can actually occur —
    the switch emits one gram subgraph PER BRANCH per factor, so
    restricting the table to the ops present in a search (engine passes
    ``config.coded_ops``) shrinks compile time ~3x.
    """
    branches = []
    for code in table:
        fn = ops.GRAM_FNS[code]
        if code == ops.EMPTY:
            branches.append(
                lambda p, a, b, d: jnp.ones((a.shape[0], b.shape[0]),
                                            dtype=a.dtype)
            )
        else:
            branches.append(partial(_call_full, fn))
    return jax.lax.switch(_code_index(op, table), branches,
                          p, x1, x2, degree)


def _call_full(fn, p, a, b, d):
    return fn(p, a, b, degree=d, order=1)


def _factor_diag(op, p, x, degree, table=_ALL_OPS):
    branches = []
    for code in table:
        fn = ops.DIAG_FNS[code]
        if code == ops.EMPTY:
            branches.append(lambda p, a, d: jnp.ones_like(a))
        else:
            branches.append(partial(_call_diag, fn))
    return jax.lax.switch(_code_index(op, table), branches, p, x, degree)


def _call_diag(fn, p, a, d):
    return fn(p, a, degree=d, order=1)


# --- order-aware coded dispatch ------------------------------------------
# Used only when the coded dict carries an "orders" array (a spec with a
# non-default arccosine order somewhere). The default path above keeps its
# exact operand set so compiled search programs stay cache-valid; gpflow's
# ArcCosine supports orders (0, 1, 2) (kernels/ops.py:76).


def _arccos_gram_ord(p, a, b, d, o):
    return jax.lax.switch(
        jnp.clip(o, 0, 2),
        [lambda p, a, b, d: ops.k_arccosine(p, a, b, degree=d, order=0),
         lambda p, a, b, d: ops.k_arccosine(p, a, b, degree=d, order=1),
         lambda p, a, b, d: ops.k_arccosine(p, a, b, degree=d, order=2)],
        p, a, b, d)


def _arccos_diag_ord(p, a, d, o):
    return jax.lax.switch(
        jnp.clip(o, 0, 2),
        [lambda p, a, d: ops.kdiag_arccosine(p, a, degree=d, order=0),
         lambda p, a, d: ops.kdiag_arccosine(p, a, degree=d, order=1),
         lambda p, a, d: ops.kdiag_arccosine(p, a, degree=d, order=2)],
        p, a, d)


def _factor_gram_ord(op, p, x1, x2, degree, order, table=_ALL_OPS):
    branches = []
    for code in table:
        fn = ops.GRAM_FNS[code]
        if code == ops.EMPTY:
            branches.append(
                lambda p, a, b, d, o: jnp.ones((a.shape[0], b.shape[0]),
                                               dtype=a.dtype))
        elif code == ops.ARCCOSINE:
            branches.append(_arccos_gram_ord)
        else:
            branches.append(
                partial(lambda fn, p, a, b, d, o:
                        fn(p, a, b, degree=d, order=1), fn))
    return jax.lax.switch(_code_index(op, table), branches,
                          p, x1, x2, degree, order)


def _factor_diag_ord(op, p, x, degree, order, table=_ALL_OPS):
    branches = []
    for code in table:
        fn = ops.DIAG_FNS[code]
        if code == ops.EMPTY:
            branches.append(lambda p, a, d, o: jnp.ones_like(a))
        elif code == ops.ARCCOSINE:
            branches.append(_arccos_diag_ord)
        else:
            branches.append(
                partial(lambda fn, p, a, d, o:
                        fn(p, a, degree=d, order=1), fn))
    return jax.lax.switch(_code_index(op, table), branches,
                          p, x, degree, order)


def gram_coded(
    coded: dict,
    raw: jnp.ndarray,
    X1: jnp.ndarray,
    X2: Optional[jnp.ndarray] = None,
    component_mask: Optional[jnp.ndarray] = None,
    ops_table: Optional[tuple] = None,
):
    """Gram with runtime structure. ``coded`` from ``KernelSpec.coded()``.

    ``ops_table``: static tuple restricting the per-factor op switch to the
    codes that can occur (must include EMPTY); None = all ops.

    Arccosine order: the default-order coded dict omits "orders" and uses
    the original dispatch (identical program, cache-valid); a spec with a
    non-default order exports an "orders" array and routes through the
    order-aware switch.
    """
    if X2 is None:
        X2 = X1
    table = ops_table or _ALL_OPS
    params = constrain(raw)
    op_arr, dim_arr, deg_arr = coded["ops"], coded["dims"], coded["degrees"]
    ord_arr = coded.get("orders")
    C, F = op_arr.shape
    N1, N2 = X1.shape[0], X2.shape[0]
    total = jnp.zeros((N1, N2), dtype=X1.dtype)
    for i in range(C):
        Kc = jnp.ones((N1, N2), dtype=X1.dtype)
        for j in range(F):
            x1 = jnp.take(X1, dim_arr[i, j], axis=1)
            x2 = jnp.take(X2, dim_arr[i, j], axis=1)
            if ord_arr is None:
                kij = _factor_gram(op_arr[i, j], params[i, j], x1, x2,
                                   deg_arr[i, j], table)
            else:
                kij = _factor_gram_ord(op_arr[i, j], params[i, j], x1, x2,
                                       deg_arr[i, j], ord_arr[i, j], table)
            Kc = Kc * kij
        active = jnp.any(op_arr[i] != ops.EMPTY).astype(X1.dtype)
        if component_mask is not None:
            active = active * component_mask[i]
        total = total + Kc * active
    return total


def gram_diag_coded(
    coded: dict,
    raw: jnp.ndarray,
    X: jnp.ndarray,
    component_mask: Optional[jnp.ndarray] = None,
    ops_table: Optional[tuple] = None,
):
    table = ops_table or _ALL_OPS
    params = constrain(raw)
    op_arr, dim_arr, deg_arr = coded["ops"], coded["dims"], coded["degrees"]
    ord_arr = coded.get("orders")
    C, F = op_arr.shape
    total = jnp.zeros((X.shape[0],), dtype=X.dtype)
    for i in range(C):
        kd = jnp.ones((X.shape[0],), dtype=X.dtype)
        for j in range(F):
            x = jnp.take(X, dim_arr[i, j], axis=1)
            if ord_arr is None:
                dij = _factor_diag(op_arr[i, j], params[i, j], x,
                                   deg_arr[i, j], table)
            else:
                dij = _factor_diag_ord(op_arr[i, j], params[i, j], x,
                                       deg_arr[i, j], ord_arr[i, j], table)
            kd = kd * dij
        active = jnp.any(op_arr[i] != ops.EMPTY).astype(X.dtype)
        if component_mask is not None:
            active = active * component_mask[i]
        total = total + kd * active
    return total


# ---------------------------------------------------------------------------
# variance introspection (find_variance_components parity)
# ---------------------------------------------------------------------------


def component_variances(spec: KernelSpec, raw: jnp.ndarray):
    """(C,) product over factors of constrained variance params.

    Matches ``find_variance_components(kern, sum_reduce=False)``
    (utilities.py:1012-1062): product kernels multiply factor variances
    (frozen interaction factors contribute their fixed 1.0), periodic uses
    the base-kernel variance, empty contributes 0.
    """
    params = constrain(raw)
    spec_p = spec.padded()
    out = []
    for i, comp in enumerate(spec_p.components):
        v = None
        for j, prim in enumerate(comp):
            if prim.op == "empty":
                continue
            v = params[i, j, 0] if v is None else v * params[i, j, 0]
        out.append(jnp.zeros(()) if v is None else v)
    return jnp.stack(out).astype(raw.dtype)
