"""Device-mesh utilities: the TPU-native replacement for Ray.

The reference farms per-outcome fits to Ray worker processes
(model_search.py:434-500) and scales out via SLURM arrays (SURVEY.md §2.8).
Here the outcome axis is a *sharded batch axis* on a ``jax.sharding.Mesh``:
identical fits vmap into one SPMD program, XLA partitions the batch across
chips over ICI, and multi-host runs partition outcome groups across
processes over DCN (no collectives needed — fits are independent, exactly
like the reference's task parallelism).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


OUTCOME_AXIS = "outcomes"


def outcome_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over all (or given) devices with axis name "outcomes"."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (OUTCOME_AXIS,))


def pad_batch(n: int, num_shards: int) -> int:
    """Smallest multiple of num_shards ≥ n (outcome batches are padded so
    the sharded axis divides evenly; padded fits are discarded)."""
    return ((n + num_shards - 1) // num_shards) * num_shards


def shard_leading_axis(tree, mesh: Mesh):
    """Place every leaf with its leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(OUTCOME_AXIS))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree.map(put, tree)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def process_partition(items: Sequence, process_index: Optional[int] = None,
                      process_count: Optional[int] = None):
    """Partition a list of outcomes across hosts (DCN level).

    The multi-host analogue of the reference's SLURM-array sharding
    (examples/simulations/sim_waveome_hpc_script.sh): each host takes a
    contiguous slice; no cross-host communication is needed.
    """
    pi = process_index if process_index is not None else jax.process_index()
    pc = process_count if process_count is not None else jax.process_count()
    n = len(items)
    per = (n + pc - 1) // pc
    return list(items[pi * per: (pi + 1) * per])
