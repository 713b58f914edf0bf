"""Test configuration: CPU backend, 8 virtual devices, float64 parity mode.

Per SURVEY.md §4, multi-device behavior is tested on a simulated 8-device
CPU mesh so no TPU is needed for CI; numerical parity tests run in float64
(the reference's default precision) on CPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

# This image registers an experimental TPU-tunnel PJRT plugin ("axon") into
# every Python process; initializing it costs a ~3-minute network handshake
# and claims the single TPU chip. Tests are CPU-only — drop the factory so
# backend discovery never touches it.
from jax._src import xla_bridge as _xb  # noqa: E402

_xb._backend_factories.pop("axon", None)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: the vmapped L-BFGS programs dominate test
# wall time; caching them makes re-runs fast. WAVEOME_TEST_CACHE_DIR
# points a run at a different (e.g. empty) cache to measure cold time.
_cache_dir = os.environ.get(
    "WAVEOME_TEST_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import waveome_tpu  # noqa: E402

waveome_tpu.set_precision("float64")
