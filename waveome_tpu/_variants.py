"""Env-gated cache-miss logging for the module-level jit-program
factories.

Every distinct (config, statics) key of an ``lru_cache``'d factory is one
traced + XLA-compiled program family — the unit of the suite's cold
compile tax. Set ``WAVEOME_LOG_VARIANTS=1`` and each factory miss prints
one ``[variant]`` line to stderr, so a cold run (e.g.
``WAVEOME_TEST_CACHE_DIR=/tmp/empty pytest -s``) yields an exact census
of which program variants exist and which test creates each.

Zero overhead when the env var is unset (the decorator returns the
function unchanged).
"""

from __future__ import annotations

import functools
import os
import sys


def variant_logged(fn):
    """Wrap an ``lru_cache``'d factory to log each cache miss."""
    if not os.environ.get("WAVEOME_LOG_VARIANTS"):
        return fn

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        before = fn.cache_info().misses
        out = fn(*args, **kwargs)
        if fn.cache_info().misses > before:
            key = ", ".join(
                [repr(a) for a in args]
                + [f"{k}={v!r}" for k, v in kwargs.items()]
            )
            print(f"[variant] {fn.__module__.split('.')[-1]}."
                  f"{fn.__name__}({key})", file=sys.stderr, flush=True)
        return out

    wrapper.cache_info = fn.cache_info
    wrapper.cache_clear = fn.cache_clear
    return wrapper
