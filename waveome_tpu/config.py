"""Global configuration: precision switch and option dataclasses.

TPU-native re-design of the reference's precision plumbing
(``waveome/utilities.py:34-64`` — ``set_precision``/``get_precision`` and the
GPflow float64 default) and its layered kwargs-dict configuration
(``waveome/model_search.py:203-214``).

Design divergence from the reference: the reference defaults to float64
because CPU TF is float64-friendly. On TPU, float32 is the fast path (the MXU
has no native f64), so the library defaults to float32 and offers
``set_precision("float64")`` as the *parity mode* used by the test-suite to
match GPflow numerics (this also flips ``jax_enable_x64``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp

_DEFAULT_FLOAT = jnp.float32
_DEFAULT_JITTER = None  # None → precision-dependent default


def set_precision(precision: str = "float32") -> None:
    """Set default floating point precision ("float32" or "float64").

    Mirrors ``waveome.utilities.set_precision`` (utilities.py:34-49). Selecting
    float64 enables JAX x64 mode globally (needed for the GPflow-parity tests,
    which run on the CPU backend).
    """
    global _DEFAULT_FLOAT
    if precision not in ("float32", "float64"):
        raise ValueError("Precision must be either 'float32' or 'float64'")
    if precision == "float64":
        jax.config.update("jax_enable_x64", True)
        _DEFAULT_FLOAT = jnp.float64
    else:
        _DEFAULT_FLOAT = jnp.float32


def get_precision() -> str:
    """Return current default precision string (utilities.py:52-60)."""
    return "float64" if _DEFAULT_FLOAT == jnp.float64 else "float32"


def default_float():
    return _DEFAULT_FLOAT


def default_jitter() -> float:
    """Cholesky jitter. The reference/GPflow default is 1e-6 in float64;
    the float32 TPU fast path needs a larger floor for stable batched
    Cholesky factorizations."""
    if _DEFAULT_JITTER is not None:
        return _DEFAULT_JITTER
    return 1e-6 if _DEFAULT_FLOAT == jnp.float64 else 1e-4


def set_jitter(value: Optional[float]) -> None:
    global _DEFAULT_JITTER
    _DEFAULT_JITTER = None if value is None else float(value)


# ---------------------------------------------------------------------------
# Typed option groups (replacing the reference's kwargs dictionaries,
# model_search.py:203-214 / model_classes.py:1110-1126, per SURVEY.md §5.6)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class KernelOptions:
    """Options for the saturated kernel builder (regularization.py:14-26)."""

    second_order_numeric: bool = False
    categorical_numeric_interactions: bool = True
    unit_numeric_interactions: bool = False
    kerns: Sequence[str] = ("squared_exponential",)
    ranks: Any = None  # int | dict[int, int] | None — LMC rank replication


@dataclasses.dataclass(frozen=True)
class SparseOptions:
    """Inducing point options (model_classes.py:690-700)."""

    num_inducing_points: int = 500
    train_inducing: bool = True
    random_points: bool = True
    random_seed: Optional[int] = None


@dataclasses.dataclass(frozen=True)
class PenalizedOptions:
    """Horseshoe penalization options (model_classes.py:788-815)."""

    penalization_factor: float = 1.0


@dataclasses.dataclass(frozen=True)
class VariationalOptions:
    """Likelihood / variational options (model_classes.py:622-634)."""

    likelihood: str = "gaussian"
    scale_value: Optional[float] = None


@dataclasses.dataclass(frozen=True)
class OptimizationOptions:
    """Optimizer options (model_classes.py:236-246).

    ``optimizer`` ∈ {"lbfgs", "adam", "adam/natgrad", None}. ``None`` picks
    L-BFGS for ≤ ``lbfgs_param_threshold`` trainable params else adam/natgrad,
    mirroring the reference's scipy-vs-adam dispatch
    (model_classes.py:299-346) with L-BFGS now a vmappable pure-JAX loop.
    """

    optimizer: Optional[str] = "lbfgs"
    num_opt_iter: int = 500
    adam_learning_rate: float = 0.1
    adam_decay_rate: float = 0.96
    nat_gradient_gamma: float = 0.1
    convergence_threshold: float = 1e-9
    lbfgs_param_threshold: int = 5000
    lbfgs_history: int = 10
    minibatch_size: Optional[int] = None
