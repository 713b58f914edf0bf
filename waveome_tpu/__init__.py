"""waveome_tpu — TPU-native automated longitudinal GP analysis.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
``waveome`` package (GPflow/TensorFlow/Ray): compositional-kernel Gaussian
processes with automated variable selection (horseshoe-penalized saturated
kernels and greedy kernel-structure search), non-Gaussian likelihoods via
SVGP, multi-output linear coregionalization, and interpretation tooling —
with per-outcome parallelism expressed as vmap-batched, mesh-sharded XLA
fits instead of one Ray process per outcome.
"""

from .config import (
    KernelOptions,
    OptimizationOptions,
    PenalizedOptions,
    SparseOptions,
    VariationalOptions,
    default_float,
    get_precision,
    set_precision,
)
from .kernels.build import full_kernel_build
from .kernels.spec import KernelSpec, Primitive
from .likelihoods import gp_likelihood_crosswalk

__version__ = "0.1.0"

__all__ = [
    "KernelOptions",
    "OptimizationOptions",
    "PenalizedOptions",
    "SparseOptions",
    "VariationalOptions",
    "default_float",
    "get_precision",
    "set_precision",
    "full_kernel_build",
    "KernelSpec",
    "Primitive",
    "gp_likelihood_crosswalk",
    "GPSearch",
]


def __getattr__(name):
    # Lazy import: GPSearch pulls in the full stack (optimizers, search,
    # plotting); keep bare `import waveome_tpu` light.
    if name == "GPSearch":
        from .api import GPSearch

        return GPSearch
    raise AttributeError(name)
