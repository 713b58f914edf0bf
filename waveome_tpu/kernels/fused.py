"""Fused banked coded-structure gram — the search-path hot kernel.

Why this exists: the plain coded dispatch (``gram.gram_coded``) evaluates a
``lax.switch`` over op codes per (component, factor) slot. Under ``vmap``
over a candidate batch the switch index is batched, so XLA lowers it to
*computing every branch* and selecting — C×F×|ops_table| full (N, N) gram
primitives per loss evaluation, all on the VPU, recomputing pairwise
distances from scratch every optimizer iteration. That is the measured
bottleneck of the greedy search (the reference's ``kernel_test`` hot loop,
model_search.py:2239-2334; see docs/BENCHMARKS.md "throughput anatomy").

The fused path restructures the same math around what is actually constant
during optimization:

* **Distance banks** ``B`` (Kb, N, N): squared and absolute pairwise
  distances per input dimension, computed ONCE per candidate batch and
  passed as data — they depend only on X, never on parameters.
* **Stationary exponents as a GEMM**: every SE/Matérn/(RQ via slots) factor
  contributes ``coef · B[row]`` to its component's exponent, so the summed
  exponent is ``R = W @ B`` with a tiny per-candidate routing matrix
  ``W`` (C, Kb) built from the constrained parameters. Under vmap this is
  one large matmul — bank reads amortize across the whole candidate batch
  on the MXU instead of C×F×|table| VPU broadcasts per candidate.
* **Param-free factor products**: categorical equality and linear ``x·x'``
  factors carry only a variance scalar; the (N, N) part of each component's
  cat/lin factor product is precomputed per *unique signature* across the
  batch (``CL`` bank, usually a handful of distinct products) and gathered
  per component.
* **Special slots**: ops that don't fit the exp-of-GEMM form (periodic's
  parametric sin, Matérn 3/2 & 5/2 polynomial prefactors, polynomial,
  arccosine, rational-quadratic) are compacted into a short static list of
  per-candidate slots — cost scales with how many such factors a candidate
  actually has (bucketed), not with C×F×|table|.

The result per component is ``V_c · CL_c · Π(prefactors) · exp(−R_c)`` —
algebraically identical to the product-of-primitives form (exp(Σ) = Π exp),
verified against ``gram_coded`` in tests/test_fused.py.

Reference parity: this computes the same sum-of-products kernels as
``waveome/kernels.py`` + gpflow Sum/Product trees (SURVEY.md §2.2); it is a
TPU execution strategy, not a semantic change.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..bijectors import softplus
from . import ops
from .spec import KernelSpec

# ops whose (N, N) shape is a pure exp(-coef·bank_row) — routed through the
# GEMM. Matérn 3/2 & 5/2 are *also* special (their polynomial prefactor).
_GEMM_COEF_NONE = 0
_GEMM_COEF_SE = 1  # 0.5 / ℓ²  on the sqdist row
_GEMM_COEF_M12 = 2  # 1 / ℓ     on the absdist row
_GEMM_COEF_M32 = 3  # √3 / ℓ    on the absdist row
_GEMM_COEF_M52 = 4  # √5 / ℓ    on the absdist row

# ops handled entirely by V (variance product) and/or CL (param-free bank)
_PLAIN_OPS = frozenset({
    ops.EMPTY, ops.CONSTANT, ops.LINEAR, ops.CATEGORICAL,
    ops.SQUARED_EXPONENTIAL, ops.MATERN12, ops.MATERN32, ops.MATERN52,
})
# ops that need a special slot (in addition to any GEMM contribution)
_SPECIAL_OPS = frozenset({
    ops.PERIODIC, ops.MATERN32, ops.MATERN52, ops.POLYNOMIAL,
    ops.ARCCOSINE, ops.RATIONAL_QUADRATIC,
})

_S_BUCKETS = (0, 1, 2, 4, 8, 16)
_U_BUCKETS = (1, 2, 4, 8, 16, 32, 64)


@dataclasses.dataclass(frozen=True)
class FusedLayout:
    """STATIC identity of a fused-gram program (hashable; lives on
    SVGPConfig so jitted-fitter caches key on it).

    ``n_dims``: bank rows exist for every input dim (row 2d = sqdist of
    dim d, row 2d+1 = absdist) — keyed to the dataset, not to the
    candidate set, so every expansion step of a search reuses one layout.
    ``n_cl``: bucketed size of the CL bank (contents are data).
    ``n_special``: bucketed per-candidate special-slot count.
    ``special_table``: op codes the special-slot switch can dispatch to.
    """

    n_dims: int
    n_cl: int
    n_special: int
    special_table: Tuple[int, ...]


def supported(specs: Sequence[KernelSpec]) -> bool:
    """True when every spec routes through the fused path (all arccosine
    factors at default order 1; every op in the known tables)."""
    for s in specs:
        for comp in s.components:
            for p in comp:
                if p.code not in _PLAIN_OPS and p.code not in _SPECIAL_OPS:
                    return False
                if p.code == ops.ARCCOSINE and p.order != 1:
                    return False
    return True


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return n


def _cl_key(comp) -> tuple:
    """Unique signature of a component's param-free (N, N) factor product."""
    key = []
    for p in comp:
        if p.code == ops.CATEGORICAL:
            key.append(("cat", p.dim))
        elif p.code == ops.LINEAR:
            key.append(("lin", p.dim))
    return tuple(sorted(key))


def build_layout(specs: Sequence[KernelSpec], n_dims: int,
                 C: int, F: int):
    """Host-side: derive the static layout + per-candidate routing arrays.

    Returns ``(layout, cl_keys, routing)`` where ``routing`` is a dict of
    stacked numpy arrays (leading axis = candidate) to merge into the
    engine's ``coded`` dict, and ``cl_keys`` drives ``build_cl_bank``.
    """
    n_cand = len(specs)
    padded = [s.padded(C, F) for s in specs]

    # unique CL signatures across the batch ("()" = identity first so the
    # all-ones row always exists for padding slots)
    keys = [()]
    key_idx = {(): 0}
    specials_present = set()
    max_special = 0
    for sp in padded:
        n_spec = 0
        for comp in sp.components:
            k = _cl_key(comp)
            if k not in key_idx:
                key_idx[k] = len(keys)
                keys.append(k)
            for p in comp:
                if p.code in _SPECIAL_OPS:
                    specials_present.add(p.code)
                    n_spec += 1
        max_special = max(max_special, n_spec)

    U = _bucket(len(keys), _U_BUCKETS)
    S = _bucket(max_special, _S_BUCKETS)
    table = tuple(sorted(specials_present))
    layout = FusedLayout(n_dims=n_dims, n_cl=U, n_special=S,
                         special_table=table)

    gsel = np.zeros((n_cand, C, F), dtype=np.int32)
    ckind = np.zeros((n_cand, C, F), dtype=np.int32)
    vuse = np.zeros((n_cand, C, F), dtype=bool)
    active = np.zeros((n_cand, C), dtype=bool)
    clidx = np.zeros((n_cand, C), dtype=np.int32)
    sp_kind = np.zeros((n_cand, S), dtype=np.int32)  # 0 = null slot
    sp_comp = np.zeros((n_cand, S), dtype=np.int32)
    sp_fac = np.zeros((n_cand, S), dtype=np.int32)
    sp_dim = np.zeros((n_cand, S), dtype=np.int32)
    sp_deg = np.zeros((n_cand, S), dtype=np.float64)

    for b, sp in enumerate(padded):
        slot = 0
        for i, comp in enumerate(sp.components):
            has_active = any(p.code != ops.EMPTY for p in comp)
            active[b, i] = has_active
            clidx[b, i] = key_idx[_cl_key(comp)]
            for j, p in enumerate(comp):
                code = p.code
                if code == ops.EMPTY:
                    continue
                # variance scalar → V product (polynomial keeps its
                # variance inside the power; everything else is v·shape)
                if code != ops.POLYNOMIAL:
                    vuse[b, i, j] = True
                if code == ops.SQUARED_EXPONENTIAL:
                    gsel[b, i, j] = 2 * p.dim
                    ckind[b, i, j] = _GEMM_COEF_SE
                elif code == ops.MATERN12:
                    gsel[b, i, j] = 2 * p.dim + 1
                    ckind[b, i, j] = _GEMM_COEF_M12
                elif code == ops.MATERN32:
                    gsel[b, i, j] = 2 * p.dim + 1
                    ckind[b, i, j] = _GEMM_COEF_M32
                elif code == ops.MATERN52:
                    gsel[b, i, j] = 2 * p.dim + 1
                    ckind[b, i, j] = _GEMM_COEF_M52
                if code in _SPECIAL_OPS:
                    sp_kind[b, slot] = 1 + table.index(code)
                    sp_comp[b, slot] = i
                    sp_fac[b, slot] = j
                    sp_dim[b, slot] = p.dim
                    sp_deg[b, slot] = p.degree
                    slot += 1

    routing = {
        "f_gsel": gsel, "f_ckind": ckind, "f_vuse": vuse,
        "f_active": active, "f_clidx": clidx,
        "f_spkind": sp_kind, "f_spcomp": sp_comp, "f_spfac": sp_fac,
        "f_spdim": sp_dim, "f_spdeg": sp_deg,
    }
    return layout, keys, routing


def routing_for_spec(spec: KernelSpec, layout: FusedLayout,
                     cl_key_index: dict, C: int, F: int) -> dict:
    """Routing arrays for ONE spec against an existing layout (used by
    non-engine callers that reuse a layout)."""
    layout2, _keys, routing = build_layout([spec], layout.n_dims, C, F)
    if (layout2.n_special > layout.n_special
            or any(c not in cl_key_index for c in _keys)):
        raise ValueError("spec does not fit the layout")
    return {k: v[0] for k, v in routing.items()}


# ---------------------------------------------------------------------------
# device-side banks
# ---------------------------------------------------------------------------


def build_banks(layout: FusedLayout, cl_keys, X) -> tuple:
    """Build the per-batch data banks from the (banked) design matrix.

    Returns ``(B, CL, CLdiag, xcols)``:
      B      (2·n_dims, N, N)  sqdist/absdist rows per dim
      CL     (n_cl, N, N)      unique cat/lin component products (padded
                               with identity rows)
      CLdiag (n_cl, N)         their diagonals
      xcols  (n_dims, N)       raw columns (special slots: poly/arccos)
    """
    X = jnp.asarray(X)
    N = X.shape[0]
    dtype = X.dtype
    rows = []
    for d in range(layout.n_dims):
        x = X[:, d]
        sd = x[:, None] - x[None, :]
        rows.append(sd * sd)
        rows.append(jnp.abs(sd))
    B = jnp.stack(rows)

    cl_rows = []
    cld_rows = []
    for key in cl_keys:
        m = jnp.ones((N, N), dtype=dtype)
        md = jnp.ones((N,), dtype=dtype)
        for kind, d in key:
            x = X[:, d]
            if kind == "cat":
                r = jnp.round(x)
                m = m * (r[:, None] == r[None, :]).astype(dtype)
                # diag of the equality kernel is 1 — md unchanged
            else:
                m = m * (x[:, None] * x[None, :])
                md = md * (x * x)
        cl_rows.append(m)
        cld_rows.append(md)
    for _ in range(layout.n_cl - len(cl_keys)):
        cl_rows.append(jnp.ones((N, N), dtype=dtype))
        cld_rows.append(jnp.ones((N,), dtype=dtype))
    CL = jnp.stack(cl_rows)
    CLdiag = jnp.stack(cld_rows)
    return (B, CL, CLdiag, X.T)


# ---------------------------------------------------------------------------
# special-slot branches
# ---------------------------------------------------------------------------

_LS_FLOOR = ops._LS_FLOOR


def _safe(v):
    return jnp.maximum(v, _LS_FLOOR)


def _sp_branches(table, diag: bool):
    """Branch list for the special-slot switch. Each branch maps
    ``(p, xcol, sqrow, adrow, deg)`` → ``(add_term, mul_term)`` where
    ``add_term`` joins the component's exponent R and ``mul_term`` its
    prefactor product. ``diag`` variants operate on (N,) slices."""

    def null(p, x, sq, ad, deg):
        z = jnp.zeros_like(ad)
        return z, jnp.ones_like(ad)

    def periodic(p, x, sq, ad, deg):
        # gpflow Periodic(SE): exp(−2 sin²(π·r/period)/ℓ²); sin² is even
        # so |r| (the absdist row) is equivalent to the signed distance
        s = jnp.sin(math.pi * ad / _safe(p[2])) / _safe(p[1])
        return 2.0 * s * s, jnp.ones_like(ad)

    def matern32(p, x, sq, ad, deg):
        r = math.sqrt(3.0) * ad / _safe(p[1])
        return jnp.zeros_like(ad), 1.0 + r

    def matern52(p, x, sq, ad, deg):
        r = math.sqrt(5.0) * ad / _safe(p[1])
        return jnp.zeros_like(ad), 1.0 + r + r * r / 3.0

    def polynomial(p, x, sq, ad, deg):
        if diag:
            outer = x * x
        else:
            outer = x[:, None] * x[None, :]
        return jnp.zeros_like(ad), (p[0] * outer + p[2]) ** deg

    def arccosine(p, x, sq, ad, deg):
        # order-1 arccosine WITHOUT the leading variance (it rides in V)
        w, bias = p[1], p[2]
        d1 = w * x * x + bias
        if diag:
            theta = jnp.zeros_like(x)
            J = ops._arccos_J(theta, 1)
            return jnp.zeros_like(ad), J / math.pi * d1
        full = w * (x[:, None] * x[None, :]) + bias
        denom = jnp.sqrt(jnp.maximum(d1[:, None] * d1[None, :], 1e-30))
        cos_theta = full / denom
        jitter = 1e-15
        theta = jnp.arccos(jitter + (1.0 - 2.0 * jitter) * cos_theta)
        J = ops._arccos_J(theta, 1)
        scale = jnp.sqrt(d1[:, None] * d1[None, :])
        return jnp.zeros_like(ad), J / math.pi * scale

    def ratquad(p, x, sq, ad, deg):
        alpha = p[2]
        ls = _safe(p[1])
        return alpha * jnp.log1p(sq / (2.0 * alpha * ls * ls)), (
            jnp.ones_like(ad))

    by_code = {
        ops.PERIODIC: periodic,
        ops.MATERN32: matern32,
        ops.MATERN52: matern52,
        ops.POLYNOMIAL: polynomial,
        ops.ARCCOSINE: arccosine,
        ops.RATIONAL_QUADRATIC: ratquad,
    }
    return [null] + [by_code[c] for c in table]


# ---------------------------------------------------------------------------
# the fused gram
# ---------------------------------------------------------------------------


def _coef_matrix(layout: FusedLayout, coded, params):
    """(C, 2·n_dims) GEMM routing matrix W from constrained params."""
    var = params[..., 0]
    ls = _safe(params[..., 1])
    ckind = coded["f_ckind"]
    coef = jnp.select(
        [ckind == _GEMM_COEF_SE, ckind == _GEMM_COEF_M12,
         ckind == _GEMM_COEF_M32, ckind == _GEMM_COEF_M52],
        [0.5 / (ls * ls), 1.0 / ls, math.sqrt(3.0) / ls,
         math.sqrt(5.0) / ls],
        jnp.zeros_like(ls),
    )
    Kb = 2 * layout.n_dims
    onehot = jax.nn.one_hot(coded["f_gsel"], Kb, dtype=coef.dtype)
    # W[c, k] = Σ_j coef[c, j] · 1[gsel[c, j] == k]
    W = jnp.einsum("cf,cfk->ck", coef, onehot)
    vuse = coded["f_vuse"]
    V = jnp.prod(jnp.where(vuse, var, jnp.ones_like(var)), axis=1)
    V = jnp.where(coded["f_active"], V, jnp.zeros_like(V))
    return W, V


def gram_coded_fused(layout: FusedLayout, coded, raw, banks,
                     component_mask=None):
    """K(X, X) for one coded candidate against precomputed banks.

    Designed to be vmapped over the candidate axis with ``banks`` held
    constant: the einsum becomes one batched GEMM over the shared bank and
    special slots stay O(slots), not O(C·F·|table|).
    """
    B, CL, _CLdiag, xcols = banks
    params = softplus(raw)
    W, V = _coef_matrix(layout, coded, params)
    Kb, N, _ = B.shape
    # R[c] = Σ_k W[c, k] · B[k] — the MXU-routed stationary exponent
    R = jnp.einsum("ck,kmn->cmn", W, B)
    G = jnp.take(CL, coded["f_clidx"], axis=0)  # (C, N, N)

    if layout.n_special:
        branches = _sp_branches(layout.special_table, diag=False)
        for s in range(layout.n_special):
            i = coded["f_spcomp"][s]
            j = coded["f_spfac"][s]
            d = coded["f_spdim"][s]
            p = params[i, j]
            x = jnp.take(xcols, d, axis=0)
            sq = jnp.take(B, 2 * d, axis=0)
            ad = jnp.take(B, 2 * d + 1, axis=0)
            add, mul = jax.lax.switch(coded["f_spkind"][s], branches,
                                      p, x, sq, ad,
                                      coded["f_spdeg"][s])
            R = R.at[i].add(add)
            G = G.at[i].multiply(mul)

    if component_mask is not None:
        V = V * component_mask
    return jnp.einsum("c,cmn->mn", V, G * jnp.exp(-R))


def gram_diag_coded_fused(layout: FusedLayout, coded, raw, banks,
                          component_mask=None):
    """diag K(X, X): stationary/periodic/RQ diagonals are exp(0)=1, so the
    diagonal reduces to V · CLdiag with poly/arccos corrections."""
    B, _CL, CLdiag, xcols = banks
    params = softplus(raw)
    _W, V = _coef_matrix(layout, coded, params)
    N = CLdiag.shape[1]
    G = jnp.take(CLdiag, coded["f_clidx"], axis=0)  # (C, N)

    needs_diag = any(c in (ops.POLYNOMIAL, ops.ARCCOSINE)
                     for c in layout.special_table)
    if layout.n_special and needs_diag:
        branches = _sp_branches(layout.special_table, diag=True)
        zeros = jnp.zeros((N,), dtype=G.dtype)
        for s in range(layout.n_special):
            i = coded["f_spcomp"][s]
            j = coded["f_spfac"][s]
            d = coded["f_spdim"][s]
            p = params[i, j]
            x = jnp.take(xcols, d, axis=0)
            _add, mul = jax.lax.switch(coded["f_spkind"][s], branches,
                                       p, x, zeros, zeros,
                                       coded["f_spdeg"][s])
            G = G.at[i].multiply(mul)

    if component_mask is not None:
        V = V * component_mask
    return jnp.einsum("c,cn->n", V, G)
