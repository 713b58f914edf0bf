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
    for name, fn in (("pallas", pal), ("hybrid", hyb),
                     ("hybrid_xla", hyb_x)):
        Lp = fn(K)
        jax.block_until_ready(Lp)
        err = float(jnp.max(jnp.abs(Lp - Lx)) / jnp.max(jnp.abs(Lx)))
        print(f"B={B} N={N} {name} rel err vs XLA: {err:.2e}")

    for name, fn in (("xla", xla), ("pallas", pal), ("hybrid", hyb),
                     ("hybrid_xla", hyb_x)):
        t0 = time.time()
        for _ in range(10):
            out = fn(K)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / 10
        print(f"{name}: {dt * 1000:.2f} ms "
              f"({B * N ** 3 / 3 / dt / 1e12:.2f} TFLOP/s)")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
