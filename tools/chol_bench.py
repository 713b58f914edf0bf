"""On-chip microbench: Pallas batched Cholesky vs XLA (B, N, N) f32.

Usage: python tools/chol_bench.py [B] [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(B=256, N=500):
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    import jax.numpy as jnp
    import numpy as np

    from waveome_tpu.pallas_ops.chol_pallas import (
        cholesky_hybrid,
        cholesky_pallas,
    )

    rng = np.random.default_rng(0)
    A = rng.normal(size=(B, N, N)).astype(np.float32)
    K = jnp.asarray(A @ np.transpose(A, (0, 2, 1))
                    + N * np.eye(N, dtype=np.float32))

    xla = jax.jit(jax.vmap(jnp.linalg.cholesky))
    pal = jax.jit(lambda k: cholesky_pallas(k))
    hyb = jax.jit(lambda k: cholesky_hybrid(k, diag_impl="pallas"))
    hyb_x = jax.jit(lambda k: cholesky_hybrid(k, diag_impl="xla"))

    Lx = xla(K)
    jax.block_until_ready(Lx)
    variants = [("xla", xla), ("hybrid_xla", hyb_x), ("hybrid", hyb),
                ("pallas", pal)]
    ok = {"xla"}
    for name, fn in variants[1:]:
        try:
            Lp = fn(K)
            jax.block_until_ready(Lp)
            err = float(jnp.max(jnp.abs(Lp - Lx)) / jnp.max(jnp.abs(Lx)))
            print(f"B={B} N={N} {name} rel err vs XLA: {err:.2e}",
                  flush=True)
            if err < 1e-3:
                ok.add(name)
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {e}", flush=True)

    # TIMING CAVEAT (axon tunnel): jax.block_until_ready does NOT
    # synchronize on this backend — it returns with the work still
    # queued, so the classic loop-then-block pattern measures ~0 ms.
    # Each iteration therefore (a) feeds the previous OUTPUT back into
    # the next input so executions cannot overlap or be elided, and
    # (b) ends with a device->host scalar fetch, the only reliable
    # sync. Per-dispatch tunnel overhead is ~200 ms, so single-kernel
    # times are still upper bounds — only differences between variants
    # timed the same way are meaningful.
    reps = 10
    for name, fn in variants:
        if name not in ok:
            continue
        Kv = K
        float(fn(Kv)[0, 0, 0])  # warm + drain queue
        t0 = time.time()
        for _ in range(reps):
            out = fn(Kv)
            Kv = K + out[:, :1, :1] * 1e-6  # chain: input depends on out
        sync = float(out[0, 0, 0])  # noqa: F841 — forces completion
        dt = (time.time() - t0) / reps
        print(f"{name}: {dt * 1000:.2f} ms/call incl ~chain overhead "
              f"({B * N ** 3 / 3 / dt / 1e12:.2f} TFLOP/s lower bound)",
              flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
