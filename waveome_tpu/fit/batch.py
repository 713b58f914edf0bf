"""Batched per-outcome fitting engine — the Ray replacement.

The reference fits each outcome column in its own Ray worker process
(model_search.py:250-500; ~0.3 models/min on CPU, BASELINE.md). Here all
outcomes sharing the saturated kernel structure are stacked on a leading
axis, the full penalized pipeline (fit → factor iteration → prune →
importances) is vmapped, and the batch axis is sharded over the device
mesh. One XLA program fits the whole batch.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.spec import KernelSpec
from ..models import svgp
from ..parallel import mesh as meshlib
from .penalized import PenalizedFitResult, penalized_fit


class BatchFitResult(NamedTuple):
    config: object
    results: PenalizedFitResult  # leading axis = outcomes
    num_outcomes: int

    def for_outcome(self, i: int) -> PenalizedFitResult:
        return jax.tree.map(lambda a: a[i], self.results)


def fit_outcomes_penalized(
    X,
    Ys,
    spec: KernelSpec,
    likelihood: str = "gaussian",
    num_inducing_points: int = 500,
    penalization_factor: Optional[float] = None,
    num_factor_iter: int = 5,
    num_restart: int = 0,
    max_iter: int = 500,
    var_cutoff: float = 0.1,
    importance_type: str = "log_bf",
    use_mesh: bool = True,
    devices: Optional[Sequence] = None,
    seed: int = 0,
    compute_importances: bool = True,
    dtype=None,
) -> BatchFitResult:
    """Fit every column of ``Ys`` (N, B) with the penalized pipeline.

    Equivalent of one whole `penalized_optimization` outcome batch
    (model_search.py:411-500), as a single sharded XLA program.
    """
    from ..config import default_float

    dtype = dtype or default_float()
    # NOTE: keep host copies for closure-free jit argument passing — a
    # device array captured in a jit closure forces a device→host readback
    # at LOWERING time (catastrophically slow over remote-TPU tunnels).
    X_np = np.asarray(X, dtype=np.float64)
    Ys_np = np.asarray(Ys, dtype=np.float64)
    N, B = Ys_np.shape

    config = svgp.make_config(
        spec, likelihood, num_data=N, input_dim=X_np.shape[1],
        num_inducing_points=num_inducing_points,
    )
    params0 = jax.tree.map(
        np.asarray,
        svgp.init_params(config, jnp.asarray(X_np, dtype=dtype),
                         key=jax.random.PRNGKey(seed), dtype=dtype),
    )

    def pipeline(y, key, X, p0):
        return penalized_fit(
            config, p0, X, y[:, None],
            penalization_factor=penalization_factor,
            num_factor_iter=num_factor_iter,
            num_restart=num_restart,
            max_iter=max_iter,
            var_cutoff=var_cutoff,
            importance_type=importance_type,
            key=key,
            compute_importances=compute_importances,
        )

    fn = jax.jit(jax.vmap(pipeline, in_axes=(0, 0, None, None)))
    X_dev = jnp.asarray(X_np, dtype=dtype)
    p0_dev = jax.tree.map(lambda a: jnp.asarray(a, dtype=dtype), params0)

    if use_mesh and len(devices or jax.devices()) > 1:
        m = meshlib.outcome_mesh(devices)
        n_dev = len(m.devices.reshape(-1))
        B_pad = meshlib.pad_batch(B, n_dev)
        Ys_cols = jnp.asarray(
            np.concatenate(
                [Ys_np.T, np.ones((B_pad - B, N))], axis=0
            ), dtype=dtype,
        )
        keys = jax.random.split(jax.random.PRNGKey(seed), B_pad)
        Ys_cols = meshlib.shard_leading_axis(Ys_cols, m)
        keys = meshlib.shard_leading_axis(keys, m)
        X_dev = meshlib.replicate(X_dev, m)
        p0_dev = meshlib.replicate(p0_dev, m)
        results = fn(Ys_cols, keys, X_dev, p0_dev)
        results = jax.tree.map(lambda a: a[:B], results)
    else:
        keys = jax.random.split(jax.random.PRNGKey(seed), B)
        results = fn(jnp.asarray(Ys_np.T, dtype=dtype), keys, X_dev,
                     p0_dev)

    return BatchFitResult(config=config, results=results, num_outcomes=B)
