"""ctypes binding to the native host runtime (waveome_host.cc).

The native layer replaces the reference's Ray/joblib process machinery
(SURVEY.md §2.8) for everything host-side: fast CSV ingestion of omics
matrices, a thread pool, an asynchronous result sink (crash-safe streaming
checkpoints), and atomic progress counters. Falls back to pure-Python
equivalents when the shared library cannot be built (e.g. no compiler).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libwaveome_host.so")
_lib = None
_lib_lock = threading.Lock()


def _build_library() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build_library():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        # signatures
        lib.wv_pool_create.restype = ctypes.c_void_p
        lib.wv_pool_create.argtypes = [ctypes.c_int]
        lib.wv_pool_destroy.argtypes = [ctypes.c_void_p]
        lib.wv_pool_size.restype = ctypes.c_int
        lib.wv_pool_size.argtypes = [ctypes.c_void_p]

        lib.wv_csv_read.restype = ctypes.c_void_p
        lib.wv_csv_read.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                    ctypes.c_char, ctypes.c_int]
        lib.wv_csv_rows.restype = ctypes.c_int64
        lib.wv_csv_rows.argtypes = [ctypes.c_void_p]
        lib.wv_csv_cols.restype = ctypes.c_int64
        lib.wv_csv_cols.argtypes = [ctypes.c_void_p]
        lib.wv_csv_data.restype = ctypes.POINTER(ctypes.c_double)
        lib.wv_csv_data.argtypes = [ctypes.c_void_p]
        lib.wv_csv_header.restype = ctypes.c_char_p
        lib.wv_csv_header.argtypes = [ctypes.c_void_p]
        lib.wv_csv_error.restype = ctypes.c_char_p
        lib.wv_csv_error.argtypes = [ctypes.c_void_p]
        lib.wv_csv_free.argtypes = [ctypes.c_void_p]

        lib.wv_sink_create.restype = ctypes.c_void_p
        lib.wv_sink_create.argtypes = [ctypes.c_char_p]
        lib.wv_sink_put.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_void_p, ctypes.c_int64]
        lib.wv_sink_flush.argtypes = [ctypes.c_void_p]
        lib.wv_sink_written.restype = ctypes.c_int64
        lib.wv_sink_written.argtypes = [ctypes.c_void_p]
        lib.wv_sink_destroy.argtypes = [ctypes.c_void_p]

        lib.wv_counter_create.restype = ctypes.c_void_p
        lib.wv_counter_add.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.wv_counter_get.restype = ctypes.c_int64
        lib.wv_counter_get.argtypes = [ctypes.c_void_p]
        lib.wv_counter_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_library() is not None


def read_csv(path: str, has_header: bool = True, sep: str = ",",
             nthreads: int = 0):
    """Fast numeric CSV → (ndarray (rows, cols), column names | None).

    Native multithreaded parse when available, numpy fallback otherwise.
    Non-numeric fields become NaN (policy belongs to the caller — the
    GPSearch ingestion asserts no NaN, model_search.py:129-135).
    """
    lib = get_library()
    if lib is None:
        import pandas as pd

        df = pd.read_csv(path, sep=sep, header=0 if has_header else None)
        return df.to_numpy(dtype=float), (
            list(df.columns) if has_header else None
        )
    h = lib.wv_csv_read(path.encode(), int(has_header), sep.encode(),
                        nthreads)
    try:
        err = lib.wv_csv_error(h).decode()
        if err:
            raise IOError(f"read_csv('{path}'): {err}")
        rows, cols = lib.wv_csv_rows(h), lib.wv_csv_cols(h)
        buf = np.ctypeslib.as_array(lib.wv_csv_data(h),
                                    shape=(rows, cols)).copy()
        header = lib.wv_csv_header(h).decode()
        names = header.split(sep) if header else None
        return buf, names
    finally:
        lib.wv_csv_free(h)


class AsyncResultSink:
    """Stream (name, array-dict) results to disk without blocking.

    Native background-writer when available; synchronous fallback else.
    """

    def __init__(self, directory: str):
        os.makedirs(directory, exist_ok=True)
        self.directory = directory
        self._lib = get_library()
        self._sink = (
            self._lib.wv_sink_create(directory.encode())
            if self._lib is not None else None
        )

    def put(self, name: str, arrays: dict) -> None:
        import io

        bio = io.BytesIO()
        np.savez(bio, **{k: np.asarray(v) for k, v in arrays.items()})
        payload = bio.getvalue()
        if self._sink is not None:
            self._lib.wv_sink_put(self._sink, name.encode(), payload,
                                  len(payload))
        else:
            safe = "".join(c if c.isalnum() or c in "-_." else "_"
                           for c in name)
            with open(os.path.join(self.directory, f"{safe}.bin"),
                      "wb") as f:
                f.write(payload)
            # append-only name->file log, matching the native writer
            # (waveome_host.cc WriteOne) — checkpoint recovery reads it
            with open(os.path.join(self.directory, "manifest.log"),
                      "a") as mf:
                mf.write(f"{name}\t{safe}.bin\t{len(payload)}\n")

    def flush(self) -> None:
        if self._sink is not None:
            self._lib.wv_sink_flush(self._sink)

    @property
    def written(self) -> int:
        if self._sink is not None:
            return int(self._lib.wv_sink_written(self._sink))
        return -1

    def close(self) -> None:
        if self._sink is not None:
            self._lib.wv_sink_destroy(self._sink)
            self._sink = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    @staticmethod
    def load(directory: str, name: str) -> dict:
        safe = "".join(c if c.isalnum() or c in "-_." else "_"
                       for c in name)
        with np.load(os.path.join(directory, f"{safe}.bin")) as data:
            return {k: data[k] for k in data.files}


class ProgressCounter:
    """Atomic cross-thread progress counter (tqdm_ray replacement)."""

    def __init__(self, total: int = 0):
        self.total = total
        self._lib = get_library()
        if self._lib is not None:
            self._c = self._lib.wv_counter_create()
        else:
            self._c = None
            self._val = 0
            self._lock = threading.Lock()

    def add(self, n: int = 1) -> None:
        if self._c is not None:
            self._lib.wv_counter_add(self._c, n)
        else:
            with self._lock:
                self._val += n

    @property
    def value(self) -> int:
        if self._c is not None:
            return int(self._lib.wv_counter_get(self._c))
        with self._lock:
            return self._val

    def close(self) -> None:
        if self._c is not None:
            self._lib.wv_counter_destroy(self._c)
            self._c = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


# ---------------------------------------------------------------------------
# persistent-compilation-cache write guard
# ---------------------------------------------------------------------------


def install_cache_write_lock(cache_dir: str) -> None:
    """Serialize jax persistent-cache writes across processes via flock.

    Two jax processes sharing one ``jax_compilation_cache_dir`` have
    segfaulted inside the PJRT ``executable.serialize()`` that
    ``compilation_cache.put_executable_and_time`` calls (observed twice
    in round 3: a pytest suite concurrent with an on-chip sweep). An
    advisory ``flock`` around the whole put makes writes mutually
    exclusive across processes; reads stay lock-free. Idempotent;
    wraps a private jax API, so failure to install degrades to a
    warning (the cache still works, just unguarded).
    """
    import functools
    import warnings

    try:
        import fcntl

        from jax._src import compilation_cache as cc
    except Exception as e:  # pragma: no cover - jax internals moved
        warnings.warn(f"cache write lock unavailable: {e}")
        return
    if getattr(cc, "_waveome_write_lock", None) is not None:
        return
    orig = cc.put_executable_and_time
    lock_path = os.path.join(cache_dir, ".write.lock")

    @functools.wraps(orig)
    def locked_put(*args, **kwargs):
        os.makedirs(cache_dir, exist_ok=True)
        with open(lock_path, "w") as f:
            fcntl.flock(f, fcntl.LOCK_EX)
            try:
                return orig(*args, **kwargs)
            finally:
                fcntl.flock(f, fcntl.LOCK_UN)

    cc.put_executable_and_time = locked_put
    cc._waveome_write_lock = lock_path
