from .engine import fit_candidates
from .folds import make_folds
from .greedy import (
    check_if_better_metric,
    full_kernel_search,
    generate_candidates,
    keep_top_k,
    split_kernel_search,
)
from .greedy import multi_outcome_kernel_search
from .softmax import softmax_kernel_search, softmax_kernel_selection
from .sweep import run_search_sweep

__all__ = [
    "fit_candidates",
    "make_folds",
    "check_if_better_metric",
    "full_kernel_search",
    "generate_candidates",
    "keep_top_k",
    "split_kernel_search",
    "multi_outcome_kernel_search",
    "run_search_sweep",
    "softmax_kernel_search",
    "softmax_kernel_selection",
]
