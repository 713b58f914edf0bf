"""Softmax (stochastic) kernel selection.

Re-implements ``softmax_kernel_selection`` / ``softmax_kernel_search``
(model_search.py:3535-3627): sample the next model proportional to
softmax(−BIC normalized); repeat independent search trials keeping the best.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def softmax_kernel_selection(bic_list: Sequence[float],
                             name_list: Sequence[str],
                             rng: Optional[np.random.Generator] = None
                             ) -> str:
    """Sample a model name ∝ softmax of negative normalized BIC."""
    rng = rng or np.random.default_rng()
    bics = np.asarray(bic_list, dtype=float)
    finite = np.isfinite(bics)
    bics = np.where(finite, bics, np.nanmax(bics[finite]) + 1e6)
    # normalize then softmax of the negative (lower BIC → higher prob)
    z = -(bics - bics.mean()) / (bics.std() + 1e-12)
    z = z - z.max()
    probs = np.exp(z) / np.exp(z).sum()
    return str(rng.choice(np.asarray(name_list, dtype=object), p=probs))


def softmax_kernel_search(X, Y, kern_list, num_trials: int = 5,
                          random_seed: Optional[int] = None, **kwargs):
    """Repeat stochastic-exploration searches, keep the best-BIC result
    (model_search.py:3591-3627)."""
    from .greedy import full_kernel_search

    best = None
    for t in range(num_trials):
        seed = None if random_seed is None else random_seed + t
        res = full_kernel_search(
            X, Y, kern_list, softmax_select=True, random_seed=seed, **kwargs
        )
        bic = res["models"][res["best_model_name"]]["bic"]
        if best is None or bic < best[0]:
            best = (bic, res)
    return best[1]
