"""A/B a pure-XLA blocked right-looking Cholesky against jnp.linalg.cholesky
at the search hot-loop shape (B=128, N=500).

XLA's native batched Cholesky measured 0.35 TFLOP/s there (73% of every
objective eval). The blocked form keeps diagonal factors on the native
path (small, stable) but moves the panel solve to batched TRSM and the
trailing symmetric update to GEMMs — MXU work. Unlike the rejected Pallas
hybrid (pallas_ops/chol_pallas.py STATUS note) there is NO explicit
inverse: the panel is a backward-stable triangular solve.

Usage: python tools/chol_blocked_bench.py [B] [N] [blk]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, K, n=15):
    """Chained timing: block_until_ready does NOT sync on the tunneled
    backend (tools/chol_bench.py caveat) — feed the previous output back
    into the next input and end with a host scalar fetch."""
    Kv = K
    float(fn(Kv).ravel()[0])  # warm + drain queue
    t0 = time.time()
    for _ in range(n):
        out = fn(Kv)
        Kv = K + out.ravel()[0] * 1e-9
    float(out.ravel()[0])  # force completion
    return (time.time() - t0) / n


def cholesky_blocked(A, blk=128):
    """Lower Cholesky of (..., N, N) SPD batch; right-looking, XLA-native
    diag factor + batched TRSM panel + GEMM trailing update."""
    import jax
    import jax.numpy as jnp

    N = A.shape[-1]
    pad = (-N) % blk
    Np = N + pad
    batch = A.shape[:-2]
    A3 = A.reshape((-1, N, N))
    if pad:
        A3 = (
            jnp.zeros((A3.shape[0], Np, Np), A.dtype)
            .at[:, :N, :N].set(A3)
            .at[:, N:, N:].set(jnp.eye(pad, dtype=A.dtype))
        )
    L = jnp.zeros_like(A3)
    for o in range(0, Np, blk):
        D = A3[:, o:o + blk, o:o + blk]
        L11 = jnp.linalg.cholesky(D)
        L = L.at[:, o:o + blk, o:o + blk].set(L11)
        if o + blk < Np:
            A21 = A3[:, o + blk:, o:o + blk]  # (B, rem, blk)
            # P solves P @ L11^T = A21  ->  L11 @ P^T = A21^T
            P = jax.scipy.linalg.solve_triangular(
                L11, jnp.swapaxes(A21, -1, -2), lower=True)
            P = jnp.swapaxes(P, -1, -2)
            L = L.at[:, o + blk:, o:o + blk].set(P)
            A3 = A3.at[:, o + blk:, o + blk:].add(
                -jnp.einsum("brk,bsk->brs", P, P))
    if pad:
        L = L[:, :N, :N]
    return L.reshape(batch + (N, N))


def main():
    import jax
    import jax.numpy as jnp

    import waveome_tpu

    waveome_tpu.set_precision("float32")
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    blk = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    rng = np.random.default_rng(0)
    # realistic fit gram: RBF-ish + small noise (the unstable regime that
    # killed the Pallas hybrid)
    x = np.sort(rng.normal(size=N))
    K = np.exp(-0.5 * (x[:, None] - x[None, :]) ** 2 / 0.3 ** 2)
    Ks = np.stack([K + (0.05 + 0.5 * rng.random()) * np.eye(N)
                   for _ in range(B)]).astype(np.float32)
    Ks = jnp.asarray(Ks)

    f_native = jax.jit(jnp.linalg.cholesky)
    f_blocked = jax.jit(lambda a: cholesky_blocked(a, blk=blk))

    t_nat = timeit(f_native, Ks)
    flops = B * N ** 3 / 3
    print(f"native  chol B={B} N={N}: {t_nat*1e3:7.2f} ms "
          f"({flops/t_nat/1e12:.2f} TFLOP/s)")
    t_blk = timeit(f_blocked, Ks)
    print(f"blocked chol B={B} N={N} blk={blk}: {t_blk*1e3:7.2f} ms "
          f"({flops/t_blk/1e12:.2f} TFLOP/s)  speedup {t_nat/t_blk:.2f}x")

    # accuracy vs native on the ill-conditioned batch
    Ln = np.asarray(f_native(Ks))
    Lb = np.asarray(f_blocked(Ks))
    # logdet comparison (the quantity the MLL consumes)
    ld_n = 2 * np.sum(np.log(np.abs(np.diagonal(Ln, axis1=1, axis2=2))),
                      axis=1)
    ld_b = 2 * np.sum(np.log(np.abs(np.diagonal(Lb, axis1=1, axis2=2))),
                      axis=1)
    print(f"logdet |err| max {np.max(np.abs(ld_n - ld_b)):.3e} "
          f"rel {np.max(np.abs((ld_n - ld_b)/ld_n)):.3e}")
    # reconstruction error
    rec = np.einsum("bik,bjk->bij", Lb, Lb)
    print(f"recon  |K - LL^T| max {np.max(np.abs(rec - np.asarray(Ks))):.3e}")

    # gradient path (the v&g eval differentiates through the chol)
    def loss_n(a):
        L = jnp.linalg.cholesky(a)
        return jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)))

    def loss_b(a):
        L = cholesky_blocked(a, blk=blk)
        return jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)))

    g_n = jax.jit(jax.grad(loss_n))
    g_b = jax.jit(jax.grad(loss_b))
    t_gn = timeit(g_n, Ks)
    t_gb = timeit(g_b, Ks)
    print(f"grad native : {t_gn*1e3:7.2f} ms")
    print(f"grad blocked: {t_gb*1e3:7.2f} ms  speedup {t_gn/t_gb:.2f}x")
    gn = np.asarray(g_n(Ks))
    gb = np.asarray(g_b(Ks))
    print(f"grad |err| max {np.max(np.abs(gn - gb)):.3e} "
          f"rel {np.max(np.abs(gn - gb) / (np.abs(gn) + 1e-6)):.3e}")


if __name__ == "__main__":
    main()
