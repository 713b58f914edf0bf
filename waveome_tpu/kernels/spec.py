"""Static kernel structure: sum-of-products of primitives.

This replaces GPflow's mutable kernel object trees (Sum/Product nesting,
``waveome/kernels.py`` + ``gpflow.kernels``) with an immutable, hashable
``KernelSpec``: a tuple of additive components, each a tuple of primitive
factors. The spec is *static* metadata for XLA; all trainable state lives in
a dense ``(C, F, P)`` raw-parameter array (C components, F factors, P param
slots), so:

  * one compiled objective serves every outcome sharing the structure
    (→ vmap over outcomes replaces one-Ray-process-per-outcome,
    model_search.py:250-500);
  * pruning (model_classes.py:1029-1079) and leave-one-component-out feature
    importance (utilities.py:614-707) become **component masks** over a
    static graph rather than Python list surgery;
  * search candidates padded to a common (C, F) shape batch in one vmap.

Canonical naming matches the reference's load-bearing kernel-name strings
("categorical[0]+squared_exponential[2]*categorical[1]",
utilities.py:366-383 ``print_kernel_names``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import default_float
from . import ops


@dataclasses.dataclass(frozen=True)
class Primitive:
    """One base-kernel factor on a single active dimension.

    Mirrors the reference's one-active-dim kernels (kernels.py:17, :54, :93
    ``active_index``). ``train_variance=False`` reproduces the frozen
    variances of interaction factors (regularization.py:109, :132) and the
    frozen 1e-6 Constant used as the "no structure" candidate
    (model_search.py:2386-2389).
    """

    op: str
    dim: int = 0
    train_variance: bool = True
    variance_init: float = 1.0
    degree: float = 3.0  # polynomial only (static, untrained — kernels.py:53)
    order: int = 1  # arccosine only (static)

    @property
    def code(self) -> int:
        return ops.OP_CODES[self.op]

    @property
    def name(self) -> str:
        return f"{self.op}[{self.dim}]"


@dataclasses.dataclass(frozen=True)
class KernelSpec:
    """Sum-of-products kernel structure (immutable, hashable)."""

    components: Tuple[Tuple[Primitive, ...], ...]

    # -- shape --
    @property
    def num_components(self) -> int:
        return len(self.components)

    @property
    def max_factors(self) -> int:
        return max((len(c) for c in self.components), default=1)

    # -- naming (reference parity: utilities.py:366-383) --
    def component_names(self, sort_factors: bool = True) -> Tuple[str, ...]:
        names = []
        for comp in self.components:
            facs = [p.name for p in comp if p.op != "empty"]
            if not facs:
                facs = ["empty[0]"]
            if sort_factors:
                facs = sorted(facs)
            names.append("*".join(facs))
        return tuple(names)

    def name(self, sort_components: bool = False) -> str:
        names = list(self.component_names())
        if sort_components:
            names = sorted(names)
        return "+".join(names)

    def canonical_name(self) -> str:
        """Order-insensitive name for dedup (utilities.py:281-307)."""
        return "+".join(sorted(self.component_names()))

    # -- padded array views (structure-as-data) --
    def padded(self, num_components: Optional[int] = None,
               max_factors: Optional[int] = None) -> "KernelSpec":
        """Pad with EMPTY primitives to a target (C, F) shape."""
        C = num_components or self.num_components
        F = max_factors or self.max_factors
        comps = []
        for comp in self.components:
            comp = tuple(comp) + tuple(
                Primitive("empty") for _ in range(F - len(comp))
            )
            comps.append(comp)
        for _ in range(C - len(comps)):
            comps.append(tuple(Primitive("empty") for _ in range(F)))
        return KernelSpec(tuple(comps))

    def coded_np(self):
        """Host-numpy form of :meth:`coded` — no device transfers.

        The search engine preps hundreds of candidate specs per
        expansion step; on a tunneled TPU backend every per-spec
        ``jnp.asarray`` is a host→device round trip (~5 ms), which made
        spec prep rival the fit dispatch itself (search-prof2 receipts,
        round 5)."""
        spec = self.padded()
        C, F = spec.num_components, spec.max_factors
        op_arr = np.zeros((C, F), dtype=np.int32)
        dim_arr = np.zeros((C, F), dtype=np.int32)
        deg_arr = np.full((C, F), 3.0, dtype=np.float32)
        ord_arr = np.ones((C, F), dtype=np.int32)
        for i, comp in enumerate(spec.components):
            for j, p in enumerate(comp):
                op_arr[i, j] = p.code
                dim_arr[i, j] = p.dim
                deg_arr[i, j] = p.degree
                ord_arr[i, j] = p.order
        coded = {
            "ops": op_arr,
            "dims": dim_arr,
            "degrees": np.asarray(deg_arr, dtype=default_float()),
        }
        # arccosine order rides along ONLY when non-default somewhere:
        # the all-default coded dict (the search engine's case) keeps its
        # exact operand set, so existing compiled programs stay valid
        if (ord_arr != 1).any():
            coded["orders"] = ord_arr
        return coded

    def coded(self):
        """Export structure as integer arrays for the runtime-coded gram."""
        return {k: jnp.asarray(v) for k, v in self.coded_np().items()}

    # -- parameters --
    def init_raw_params_np(self) -> np.ndarray:
        """(C, F, P) f64 numpy unconstrained params at gpflow-default inits
        (value 1.0, softplus bijector), with frozen Constant placeholders at
        their fixed variance (model_search.py:2387). Host-side variant —
        no device transfer, safe under any x64 setting."""
        spec = self.padded()
        C, F, P = spec.num_components, spec.max_factors, ops.N_PARAM_SLOTS

        def sp_inv(v):  # numpy softplus-inverse (jit-trace-safe)
            return float(np.log(np.expm1(v)))

        raw = np.zeros((C, F, P), dtype=np.float64)
        one = sp_inv(1.0)
        for i, comp in enumerate(spec.components):
            for j, p in enumerate(comp):
                for s in ops.OP_PARAM_SLOTS[p.code]:
                    raw[i, j, s] = one
                if 0 in ops.OP_PARAM_SLOTS[p.code]:
                    raw[i, j, 0] = sp_inv(p.variance_init)
        return raw

    def init_raw_params(self, dtype=None) -> jnp.ndarray:
        """Device array form of :meth:`init_raw_params_np`."""
        dtype = dtype or default_float()
        return jnp.asarray(self.init_raw_params_np(), dtype=dtype)

    def _param_exists_np(self) -> np.ndarray:
        spec = self.padded()
        C, F, P = spec.num_components, spec.max_factors, ops.N_PARAM_SLOTS
        m = np.zeros((C, F, P), dtype=bool)
        for i, comp in enumerate(spec.components):
            for j, p in enumerate(comp):
                for s in ops.OP_PARAM_SLOTS[p.code]:
                    m[i, j, s] = True
        return m

    def param_exists_mask(self) -> jnp.ndarray:
        """(C, F, P) bool — slots that are real parameters."""
        return jnp.asarray(self._param_exists_np())

    def train_mask_np(self) -> np.ndarray:
        """(C, F, P) bool numpy — trainable slots (frozen variances masked
        out). Pure static metadata, safe to build inside jit traces."""
        m = self._param_exists_np()
        spec = self.padded()
        for i, comp in enumerate(spec.components):
            for j, p in enumerate(comp):
                if not p.train_variance:
                    m[i, j, 0] = False
        return m

    def train_mask(self) -> jnp.ndarray:
        return jnp.asarray(self.train_mask_np())

    def _variance_prior_np(self) -> np.ndarray:
        spec = self.padded()
        C, F = spec.num_components, spec.max_factors
        m = np.zeros((C, F), dtype=bool)
        for i, comp in enumerate(spec.components):
            for j, p in enumerate(comp):
                if (p.op != "empty" and p.train_variance
                        and 0 in ops.OP_PARAM_SLOTS[p.code]):
                    m[i, j] = True
        return m

    def variance_prior_mask(self) -> jnp.ndarray:
        """(C, F) bool — variance params that carry the horseshoe prior.

        The reference attaches the prior to every *trainable* kernel-variance
        parameter (model_classes.py:862-864; non-trainable params do not
        enter gpflow's log_prior_density).
        """
        return jnp.asarray(self._variance_prior_np())

    def num_variance_prior_params(self) -> int:
        """Static count of horseshoe-carrying variance params (the 'p' of
        the auto penalization factor, model_search.py:274-276)."""
        return int(self._variance_prior_np().sum())

    def num_trainable_kernel_params(self) -> int:
        m = self._param_exists_np()
        spec = self.padded()
        for i, comp in enumerate(spec.components):
            for j, p in enumerate(comp):
                if not p.train_variance:
                    m[i, j, 0] = False
        return int(m.sum())

    def lengthscale_mask(self) -> jnp.ndarray:
        """(C, F) bool — factors governed by a lengthscale (slot 1), used by
        the lengthscale-based pruning rule (utilities.py:1136-1153)."""
        spec = self.padded()
        C, F = spec.num_components, spec.max_factors
        m = np.zeros((C, F), dtype=bool)
        ls_ops = {
            ops.SQUARED_EXPONENTIAL, ops.MATERN12, ops.MATERN32,
            ops.MATERN52, ops.PERIODIC, ops.RATIONAL_QUADRATIC,
        }
        for i, comp in enumerate(spec.components):
            for j, p in enumerate(comp):
                if p.code in ls_ops:
                    m[i, j] = True
        return jnp.asarray(m)

    def active_factor_mask(self) -> jnp.ndarray:
        """(C, F) bool — non-empty factors."""
        spec = self.padded()
        C, F = spec.num_components, spec.max_factors
        m = np.zeros((C, F), dtype=bool)
        for i, comp in enumerate(spec.components):
            for j, p in enumerate(comp):
                m[i, j] = p.op != "empty"
        return jnp.asarray(m)

    # -- structure edits (host-side; produce new specs) --
    def keep_components(self, idx: Sequence[int]) -> "KernelSpec":
        comps = tuple(self.components[i] for i in idx)
        if not comps:
            comps = ((Primitive("constant", variance_init=1e-6,
                                train_variance=False),),)
        return KernelSpec(comps)

    def add_component(self, comp: Tuple[Primitive, ...]) -> "KernelSpec":
        return KernelSpec(tuple(self.components) + (tuple(comp),))


def single(op: str, dim: int = 0, **kw) -> KernelSpec:
    """Convenience: one-component, one-factor spec."""
    return KernelSpec(((Primitive(op, dim, **kw),),))


def from_name(name: str) -> KernelSpec:
    """Parse a canonical kernel-name string back to a spec
    (inverse of ``KernelSpec.name`` — the reference parses these strings with
    regexes in plotting, model_search.py:1303-1309).

    Accepts the rank-replication suffixes ``full_kernel_build(ranks=...)``
    generates (e.g. ``"categorical[0]_1"`` — regularization.py:65-70); the
    ``_r`` suffix is display-only and is dropped here.
    """
    import re

    fac_re = re.compile(r"^(?P<op>\w+?)(?:\[(?P<dim>\d+)\])?(?:_\d+)?$")
    comps = []
    for comp_str in name.split("+"):
        facs = []
        for fac_str in comp_str.split("*"):
            m = fac_re.match(fac_str.strip())
            if m is None:
                raise ValueError(
                    f"cannot parse kernel factor {fac_str!r} in {name!r}; "
                    "expected 'op[dim]' with an integer dim "
                    "(names generated with var_names= are display strings "
                    "and are not round-trippable)"
                )
            dim = int(m.group("dim")) if m.group("dim") else 0
            facs.append(Primitive(m.group("op"), dim))
        comps.append(tuple(facs))
    return KernelSpec(tuple(comps))
