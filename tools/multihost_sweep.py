"""Two-process sweep worker — the multi-host launch recipe, runnable on CPU.

Each process initializes distributed JAX, takes its ``process_partition``
slice of the outcome list, fits it with ``run_penalized_sweep``, and
writes results into a SHARED checkpoint directory. Disjoint slices mean
zero write conflicts and zero cross-host communication — the TPU-native
equivalent of the reference's SLURM-array × Ray scale-out
(examples/simulations/sim_waveome_hpc_script.sh).

Usage (what tests/test_aux.py::test_two_process_sweep_partition runs):

    python tools/multihost_sweep.py <ckpt_dir> <process_id> <coord_port>

Launch once with process_id=0 and once with process_id=1 (any order);
both must be running concurrently for the coordinator handshake.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

# the axon PJRT plugin overrides JAX_PLATFORMS=cpu; drop its factory and
# force the platform config back (tests/conftest.py does the same)
import jax as _jax  # noqa: E402
from jax._src import xla_bridge as _xb  # noqa: E402

_xb._backend_factories.pop("axon", None)
_jax.config.update("jax_platforms", "cpu")


def main(ckpt_dir: str, process_id: int, port: int) -> None:
    from waveome_tpu.fit.sweep import run_penalized_sweep
    from waveome_tpu.kernels import full_kernel_build
    from waveome_tpu.parallel.distributed import distributed_init

    distributed_init(
        coordinator=f"localhost:{port}",
        num_processes=2,
        process_id=process_id,
    )

    import jax
    import numpy as np

    assert jax.process_count() == 2, jax.process_count()

    # tiny shared synthetic workload (deterministic across processes)
    rng = np.random.default_rng(0)
    n_units, n_per, B = 6, 5, 8
    ids = np.repeat(np.arange(n_units), n_per).astype(float)
    t = np.tile(np.linspace(-2, 2, n_per), n_units)
    X = np.column_stack([ids, t])
    Ys = np.stack(
        [np.sin(1.5 * t + b) + 0.2 * rng.normal(size=t.size)
         for b in range(B)], axis=1,
    )

    spec, _ = full_kernel_build(
        cat_vars=[0], num_vars=[1], unit_idx=0,
        var_names=["id", "time"], return_sum=True,
    )
    results = run_penalized_sweep(
        X, Ys, spec,
        out_names=[f"y{i}" for i in range(B)],
        checkpoint_dir=ckpt_dir,
        chunk_size=4,
        partition_across_hosts=True,
        verbose=False,
        likelihood="gaussian",
        num_inducing_points=X.shape[0],
        penalization_factor=1.0,
        num_factor_iter=0,
        max_iter=60,
        # DCN pattern: each process fits its outcome slice on its LOCAL
        # devices; no cross-process mesh (matching the reference's
        # independent-per-node Ray clusters)
        use_mesh=False,
    )
    # this process must have fitted exactly its slice
    fitted = sorted(results.keys())
    print(f"process {process_id} fitted: {fitted}")
    assert len(fitted) == B // 2, fitted


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
