"""Multi-host initialization + the 2-process sweep launch recipe.

The reference scales out with SLURM array jobs, each node running an
independent Ray cluster over its own outcome slice
(examples/simulations/sim_waveome_hpc_script.sh, SURVEY.md §2.8). The
TPU-native equivalent: ``distributed_init()`` (jax.distributed) makes
every process see the global device set, ``process_partition``
(parallel/mesh.py) gives each process its outcome slice, and
``run_penalized_sweep(partition_across_hosts=True)`` fits that slice with
zero cross-host communication — results meet in a shared checkpoint
directory (each process writes disjoint outcomes).

Launch recipe (one process per host; TPU pods discover peers
automatically so bare ``distributed_init()`` suffices there):

    # host 0                            # host 1
    distributed_init(                   distributed_init(
        coordinator="h0:9999",              coordinator="h0:9999",
        num_processes=2, process_id=0)      num_processes=2, process_id=1)
    gps.penalized_optimization(         gps.penalized_optimization(
        sweep_options={                     sweep_options={
            "checkpoint_dir": SHARED})          "checkpoint_dir": SHARED})

tools/multihost_sweep.py is the runnable 2-process CPU demonstration
(tested by tests/test_aux.py::test_two_process_sweep_partition).
"""

from __future__ import annotations

import os
from typing import Optional


def distributed_init(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> None:
    """Initialize multi-process JAX (wraps jax.distributed.initialize).

    With no arguments, relies on the cluster environment (TPU pods, SLURM,
    and GKE are auto-detected by JAX). Explicit arguments support bare
    multi-host launches: ``coordinator`` is ``"host:port"`` of process 0.
    Safe to call when already initialized (no-op) or in a single-process
    run with no coordinator (no-op).
    """
    import jax
    from jax._src import distributed as _dist

    # NOTE: jax.process_count() would itself initialize the backend,
    # which forbids a later distributed.initialize — inspect the
    # distributed global state instead
    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    auto_env = any(v in os.environ for v in (
        "COORDINATOR_ADDRESS", "SLURM_JOB_ID", "TPU_WORKER_HOSTNAMES",
    ))
    if coordinator is None and num_processes is None and not auto_env:
        return  # single-process run
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
