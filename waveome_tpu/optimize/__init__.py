from .adam import AdamResult, adam_natgrad_fit
from .lbfgs import LBFGSResult, lbfgs_fit
from .natgrad import natgrad_step, natgrad_step_batched
from .restarts import random_restart_fit

__all__ = [
    "AdamResult",
    "adam_natgrad_fit",
    "LBFGSResult",
    "lbfgs_fit",
    "natgrad_step",
    "natgrad_step_batched",
    "random_restart_fit",
]
