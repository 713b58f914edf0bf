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

# Compile-heavy suites on this image have SIGSEGV'd late in the run inside
# libgcc's unwinder (dmesg: `error 4 in libgcc_s.so.1`) — a C++ exception
# unwinding through JIT EH frames after an allocation failure. The kernel's
# default vm.max_map_count (65530) is a plausible trigger: hundreds of
# jitted executables + glibc arenas approach it in a 16-minute suite. Root
# containers may raise it; ignore failures (non-root CI just keeps the
# default).
try:
    with open("/proc/sys/vm/max_map_count", "r+") as _f:
        if int(_f.read()) < 1048576:
            _f.seek(0)
            _f.write("1048576")
except OSError:
    pass

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
#
# Concurrency hardening (two defenses; jax's cache writes have segfaulted
# when two processes shared one cache dir — round-3 flake):
#   1. a non-blocking flock marks the shared cache as "in use by a pytest
#      run"; a second concurrent pytest that cannot take it falls back to
#      a private per-run temp cache (slower, but both runs complete);
#   2. all cache WRITES are serialized across processes via
#      runtime.install_cache_write_lock (guards against non-pytest jax
#      processes, e.g. an on-chip sweep, sharing the dir).
_cache_dir = os.path.abspath(os.environ.get(
    "WAVEOME_TEST_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
))
_pytest_lock_handle = None  # held for the whole session
if "WAVEOME_TEST_CACHE_DIR" not in os.environ:
    import fcntl
    import tempfile

    os.makedirs(_cache_dir, exist_ok=True)
    _pytest_lock_handle = open(
        os.path.join(_cache_dir, ".pytest.lock"), "w")
    try:
        fcntl.flock(_pytest_lock_handle, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except OSError:
        _pytest_lock_handle.close()
        _pytest_lock_handle = None
        _cache_dir = tempfile.mkdtemp(prefix="waveome_test_cache_")
        print(f"[conftest] shared .jax_cache busy (another pytest run); "
              f"using private cache {_cache_dir}")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import waveome_tpu  # noqa: E402
from waveome_tpu.runtime import install_cache_write_lock  # noqa: E402

install_cache_write_lock(_cache_dir)
waveome_tpu.set_precision("float64")
