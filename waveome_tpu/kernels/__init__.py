from . import ops
from .build import full_kernel_build
from .gram import (
    component_variances,
    gram,
    gram_coded,
    gram_diag,
    gram_diag_coded,
)
from .spec import KernelSpec, Primitive, from_name, single

__all__ = [
    "ops",
    "full_kernel_build",
    "component_variances",
    "gram",
    "gram_coded",
    "gram_diag",
    "gram_diag_coded",
    "KernelSpec",
    "Primitive",
    "from_name",
    "single",
]
