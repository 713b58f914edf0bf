"""Small parity utilities: kernel-name string manipulation and dedup.

The reference's kernel-name strings are load-bearing (SURVEY.md §2.2):
produced by print_kernel_names (utilities.py:366-383), rewritten to column
names by replace_kernel_variables (utilities.py:266-278), and compared
order-insensitively for search dedup by check_if_model_exists
(utilities.py:281-307). Our ``KernelSpec.name()`` produces the same format;
these helpers complete the round trip.
"""

from __future__ import annotations

from typing import List, Sequence


def replace_kernel_variables(k_name: str, col_names: Sequence[str]) -> str:
    """"se[1]" → "se[time]" (utilities.py:266-278)."""
    new_k_name = k_name
    for i, c in enumerate(col_names):
        new_k_name = new_k_name.replace(f"[{i}]", f"[{c}]")
    return new_k_name


def check_if_model_exists(model_name: str, model_list: List[str]) -> bool:
    """Order-insensitive additive/product-term comparison
    (utilities.py:281-307)."""
    model_name_split = model_name.split("+")
    model_name_split_ordered = {
        "".join(sorted(x)) for x in model_name_split
    }
    for existing in model_list:
        terms = {"".join(sorted(x)) for x in existing.split("+")}
        if terms == model_name_split_ordered:
            return True
    return False


def print_kernel_names(spec, with_idx: bool = True):
    """Kernel-name string(s) from a KernelSpec (utilities.py:366-383).

    Returns a list of component names for additive kernels, a single
    string otherwise — matching the reference's return-shape quirk.
    """
    names = list(spec.component_names())
    if len(names) == 1:
        return names[0]
    return names


def convert_data_to_tensors(X, Y, dtype=None):
    """(X, Y) numpy → device arrays at default float (utilities.py:67-74)."""
    import jax.numpy as jnp

    from .config import default_float

    dtype = dtype or default_float()
    return jnp.asarray(X, dtype=dtype), jnp.asarray(Y, dtype=dtype)


def variance_contributions(spec, raw, lik_name: str = "gaussian",
                           lik_variance: float = None, residuals=None):
    """Legacy variance-parameter attribution (utilities.py:403-485):
    per-additive-component variance (products multiply factor variances)
    plus the likelihood-variance share last."""
    import numpy as np

    from .kernels.gram import component_variances

    out = [round(float(v), 3)
           for v in np.asarray(component_variances(spec, raw))]
    if lik_name == "gaussian" and lik_variance is not None:
        out.append(round(float(lik_variance), 3))
    elif residuals is not None:
        out.append(float(np.std(np.asarray(residuals)) ** 2))
    return out


def variance_contributions_diag(spec, raw, X, lik_name: str = "gaussian",
                                lik_variance: float = None,
                                residuals=None):
    """Diagonal-based variance attribution (utilities.py:488-514): mean of
    each additive component's K_diag over the training inputs, plus the
    likelihood-variance share last."""
    import jax.numpy as jnp
    import numpy as np

    from .config import default_float
    from .kernels.gram import gram_diag

    X = jnp.asarray(X, dtype=default_float())
    out = []
    C = spec.padded().num_components
    for c in range(C):
        mask = np.zeros(C)
        mask[c] = 1.0
        kd = gram_diag(spec, raw, X, component_mask=jnp.asarray(
            mask, dtype=X.dtype))
        out.append(float(jnp.mean(kd)))
    if lik_name == "gaussian" and lik_variance is not None:
        out.append(round(float(lik_variance), 3))
    elif residuals is not None:
        out.append(float(np.std(np.asarray(residuals)) ** 2))
    return out
