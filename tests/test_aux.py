"""Auxiliary subsystem tests: checkpoint/resume, profiling, HMC, datasets
and evaluation metrics."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from waveome_tpu import datasets
from waveome_tpu.checkpoint import SweepCheckpoint, load_params, save_params
from waveome_tpu.hmc import hmc_sampling
from waveome_tpu.profiling import PhaseTimer


def test_sweep_checkpoint_roundtrip(tmp_path):
    ck = SweepCheckpoint(str(tmp_path / "sweep"))
    ck.set_meta(likelihood="gaussian", n=100)
    res = {"params": {"kernel_raw": np.ones((2, 1, 4))},
           "component_mask": np.array([1.0, 0.0])}
    ck.save_outcome("met/1", res)
    ck.save_outcome("met2", res)
    # resume skips done outcomes
    assert ck.remaining(["met/1", "met2", "met3"]) == ["met3"]
    ck2 = SweepCheckpoint(str(tmp_path / "sweep"))
    assert set(ck2.fitted()) == {"met/1", "met2"}
    loaded = ck2.load_outcome("met/1")
    np.testing.assert_allclose(loaded["params"]["kernel_raw"],
                               np.ones((2, 1, 4)))
    np.testing.assert_allclose(loaded["component_mask"], [1.0, 0.0])


def test_orbax_params_roundtrip(tmp_path):
    params = {"a": jnp.arange(5.0), "b": {"c": jnp.ones((2, 2))}}
    path = str(tmp_path / "ckpt")
    save_params(path, params)
    restored = load_params(path)
    np.testing.assert_allclose(np.asarray(restored["b"]["c"]),
                               np.ones((2, 2)))


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        sum(range(1000))
    with t.phase("a"):
        pass
    rep = t.report()
    assert rep["a"]["count"] == 2
    assert rep["a"]["total_s"] >= 0


def test_hmc_gaussian_target():
    """HMC on a known Gaussian posterior recovers mean/sd."""
    def logp(p):
        x = p["x"]
        return -0.5 * jnp.sum((x - 2.0) ** 2 / 0.5 ** 2)

    res = hmc_sampling(
        logp, {"x": jnp.zeros(2)}, burn_in=300, samples=800,
        random_seed=0, step_size=0.2, num_leapfrog_steps=8,
    )
    draws = np.asarray(res.samples["x"])
    assert res.traces.mean() > 0.4  # healthy acceptance
    np.testing.assert_allclose(draws.mean(axis=0), [2.0, 2.0], atol=0.15)
    np.testing.assert_allclose(draws.std(axis=0), [0.5, 0.5], atol=0.15)


def test_ground_truth_simulation_and_metrics():
    X = datasets.longitudinal_design(num_units=6, rate=5, seed=0)
    assert X.shape == (30, 3)
    truths = datasets.ground_truth_specs()
    assert set(truths) == {"y1", "y2", "y3", "y4"}
    for name, (spec, raw) in truths.items():
        Y = datasets.simulate_gp_outcomes(X, spec, raw, noise_sd=0.2,
                                          seed=1)
        assert Y.shape == (30, 1)
        assert np.isfinite(Y).all()

    # counts simulation
    Yp = datasets.simulate_gp_outcomes(
        X, *truths["y1"], seed=2, likelihood="poisson"
    )
    assert (Yp >= 0).all()

    # metrics
    kl = datasets.gaussian_kl([0.0], [1.0], [0.0], [1.0])
    assert abs(kl) < 1e-12
    assert datasets.gaussian_kl([0.0], [1.0], [1.0], [1.0]) > 0
    score = datasets.feature_recovery_score(
        [0, 2], "categorical[0]+matern12[2]"
    )
    assert score["exact"] == 1.0
    score = datasets.feature_recovery_score([0, 2], "matern12[2]")
    assert score["recall"] == 0.5 and score["precision"] == 1.0


def test_sweep_checkpoint_async_sink(tmp_path):
    """Async-sink mode: payloads stream through AsyncResultSink, the
    manifest is extended at commit(), and a crash between sink flush and
    manifest commit is recovered from the sink's manifest.log."""
    d = str(tmp_path / "async_sweep")
    ck = SweepCheckpoint(d, use_async_sink=True)
    res = {"params": {"kernel_raw": np.ones((2, 1, 4))},
           "component_mask": np.array([1.0, 0.0])}
    ck.save_outcome("m1", res)
    ck.save_outcome("m/2", res)
    # in-flight results already count as done within this process
    assert ck.remaining(["m1", "m/2", "m3"]) == ["m3"]
    ck.commit()
    assert set(ck.fitted()) == {"m1", "m/2"}

    # fresh instance reads the committed manifest and the sink payloads
    ck2 = SweepCheckpoint(d)
    assert set(ck2.fitted()) == {"m1", "m/2"}
    loaded = ck2.load_outcome("m/2")
    np.testing.assert_allclose(loaded["params"]["kernel_raw"],
                               np.ones((2, 1, 4)))

    # simulate a crash between flush and commit: write via a sink, skip
    # commit, and reopen — recovery must pick the outcome up from
    # manifest.log
    ck3 = SweepCheckpoint(d, use_async_sink=True)
    ck3.save_outcome("m4", res)
    ck3._sink.flush()  # payload durable, manifest.json not updated
    ck4 = SweepCheckpoint(d)
    assert "m4" in ck4.fitted()
    assert ck4.remaining(["m4"]) == []


def test_two_process_sweep_partition(tmp_path):
    """Two-process multi-host recipe: both processes initialize
    distributed JAX (jax.distributed via waveome_tpu.parallel.distributed),
    take disjoint process_partition slices, and fit into one shared
    checkpoint dir (the reference's SLURM-array scale-out pattern,
    examples/simulations/sim_waveome_hpc_script.sh)."""
    import os
    import socket
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(root, "tools", "multihost_sweep.py")
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    ck = str(tmp_path / "shared_ckpt")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    procs = [
        subprocess.Popen(
            [sys.executable, script, ck, str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=420)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    # disjoint halves covering all 8 outcomes
    import re

    fitted = [set(re.findall(r"'(y\d+)'", out)) for out in outs]
    assert fitted[0] & fitted[1] == set()
    assert fitted[0] | fitted[1] == {f"y{i}" for i in range(8)}

    from waveome_tpu.checkpoint import SweepCheckpoint

    ck_read = SweepCheckpoint(ck)
    assert set(ck_read.fitted()) == {f"y{i}" for i in range(8)}
