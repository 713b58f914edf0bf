"""Cluster-aware K-fold index construction.

Re-implements ``make_folds`` (regularization.py:245-276): folds are made at
the unit level when a unit column exists (so no subject straddles folds),
then expanded to row indices.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


def make_folds(X, unit_col: Optional[int] = None, k_fold: int = 5,
               random_seed: Optional[int] = None) -> List[np.ndarray]:
    rng = np.random.default_rng(random_seed)
    X = np.asarray(X)
    if unit_col is None:
        sample_idx = np.arange(X.shape[0])
    else:
        sample_idx = np.unique(X[:, unit_col])
        assert len(sample_idx) >= k_fold, (
            "Not enough unique units for number of folds requested, "
            f"{len(sample_idx)} unit(s) < {k_fold} fold(s)"
        )
    sample_idx = sample_idx.copy()
    rng.shuffle(sample_idx)
    div, mod = divmod(len(sample_idx), k_fold)
    folds = [
        sample_idx[(i * div + min(i, mod)):((i + 1) * div + min(i + 1, mod))]
        for i in range(k_fold)
    ]
    if unit_col is not None:
        folds = [np.where(np.isin(X[:, unit_col], f))[0] for f in folds]
    return folds
