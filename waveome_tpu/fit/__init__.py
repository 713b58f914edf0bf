from .batch import BatchFitResult, fit_outcomes_penalized
from .penalized import (
    PenalizedFitResult,
    auto_penalization_factor,
    penalized_finalize,
    penalized_fit,
    prune_masks,
)

__all__ = [
    "BatchFitResult",
    "fit_outcomes_penalized",
    "PenalizedFitResult",
    "auto_penalization_factor",
    "penalized_finalize",
    "penalized_fit",
    "prune_masks",
]
