"""Saturated additive kernel builder.

Re-implements ``full_kernel_build`` (regularization.py:14-189) over
``KernelSpec``: unit-id Categorical, per-category Categoricals,
per-(numeric × base-kernel) terms, optional unit×numeric and
categorical×numeric interaction products (with frozen categorical variance,
regularization.py:109, :132), optional second-order numeric interactions
(regularization.py:152-178), and per-variable rank replication for LMC
(regularization.py:43-48, :65-70).

Component ordering and generated names match the reference exactly so that
heatmaps / importances line up column-for-column.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple, Union

from .spec import KernelSpec, Primitive


def _get_rank(var_idx, ranks, default_rank) -> int:
    if isinstance(ranks, dict):
        return ranks.get(var_idx, default_rank)
    return default_rank


def full_kernel_build(
    cat_vars: Sequence[int] = (),
    num_vars: Sequence[int] = (),
    unit_idx: Optional[int] = None,
    var_names: Optional[Sequence[str]] = None,
    second_order_numeric: bool = False,
    categorical_numeric_interactions: bool = True,
    unit_numeric_interactions: bool = False,
    return_sum: bool = False,
    kerns: Sequence[str] = ("squared_exponential",),
    num_outputs: Optional[int] = None,
    ranks: Union[None, int, Dict[int, int]] = None,
) -> Union[
    KernelSpec,
    List[KernelSpec],
    Tuple[Union[KernelSpec, List[KernelSpec]], List[str]],
]:
    """Build the saturated kernel.

    ``kerns`` are op-name strings (e.g. "squared_exponential", "matern12").
    With ``return_sum=True`` returns a single ``KernelSpec`` whose components
    are the additive terms (the single-output penalized path,
    model_search.py:234-242); with ``return_sum=False`` returns a list of
    one-component specs — the LMC latent kernel list
    (model_classes.py:1224-1231).
    """
    # Default rank logic (regularization.py:27-41)
    if ranks is None:
        default_rank = num_outputs if num_outputs is not None else 1
    elif isinstance(ranks, int):
        default_rank = ranks
    else:
        default_rank = num_outputs if num_outputs is not None else 1

    components: List[Tuple[Primitive, ...]] = []
    names: List[str] = []
    cat_vars = list(cat_vars)

    def vname(idx: int) -> str:
        return var_names[idx] if var_names is not None else str(idx)

    # Unit-id categorical intercept (regularization.py:57-70)
    if unit_idx is not None:
        cat_vars = [c for c in cat_vars if c != unit_idx]
        r_unit = _get_rank(unit_idx, ranks, default_rank)
        for r in range(r_unit):
            components.append((Primitive("categorical", unit_idx),))
            suffix = f"_{r}" if r_unit > 1 else ""
            names.append(f"categorical[{vname(unit_idx)}]{suffix}")

    # Per-category categoricals (regularization.py:72-81)
    for c in cat_vars:
        r_cat = _get_rank(c, ranks, default_rank)
        for r in range(r_cat):
            components.append((Primitive("categorical", c),))
            suffix = f"_{r}" if r_cat > 1 else ""
            names.append(f"categorical[{vname(c)}]{suffix}")

    # Numeric × base-kernel terms (regularization.py:83-95)
    for n in num_vars:
        r_num = _get_rank(n, ranks, default_rank)
        for k in kerns:
            for r in range(r_num):
                components.append((Primitive(k, n),))
                suffix = f"_{r}" if r_num > 1 else ""
                names.append(f"{k}[{vname(n)}]{suffix}")

    # Unit × numeric interactions (regularization.py:103-121)
    if unit_numeric_interactions and unit_idx is not None:
        for n in num_vars:
            r_int = default_rank
            for k in kerns:
                for r in range(r_int):
                    components.append((
                        Primitive("categorical", unit_idx,
                                  train_variance=False),
                        Primitive(k, n),
                    ))
                    suffix = f"_{r}" if r_int > 1 else ""
                    names.append(
                        f"categorical[{vname(unit_idx)}]*{k}[{vname(n)}]"
                        f"{suffix}"
                    )

    # Categorical × numeric interactions (regularization.py:124-149)
    if categorical_numeric_interactions:
        for c in cat_vars:
            for n in num_vars:
                r_int = default_rank
                for k in kerns:
                    for r in range(r_int):
                        components.append((
                            Primitive("categorical", c, train_variance=False),
                            Primitive(k, n),
                        ))
                        suffix = f"_{r}" if r_int > 1 else ""
                        names.append(
                            f"categorical[{vname(c)}]*{k}[{vname(n)}]"
                            f"{suffix}"
                        )

    # Second-order numeric interactions (regularization.py:152-178)
    if second_order_numeric:
        n_count = 0
        for n_first in num_vars:
            for k_first in kerns:
                for n_second in num_vars[n_count:]:
                    for k_second in kerns:
                        r_int = default_rank
                        for r in range(r_int):
                            components.append((
                                Primitive(k_first, n_first),
                                Primitive(k_second, n_second),
                            ))
                            suffix = f"_{r}" if r_int > 1 else ""
                            names.append(
                                f"{k_first}[{vname(n_first)}]"
                                f"*{k_second}[{vname(n_second)}]{suffix}"
                            )
            n_count += 1

    if return_sum:
        out = KernelSpec(tuple(components))
    else:
        out = [KernelSpec((comp,)) for comp in components]

    if var_names is not None:
        return out, names
    return out
