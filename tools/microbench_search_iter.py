"""Micro-benchmark the search hot loop's per-iteration parts on-chip.

One plbfgs iteration of the Gaussian exact-MLL candidate fitter =
4 line-search trials (objective value only) + 1 value_and_grad.
Each objective eval = coded/fused gram (C,N,N) -> (N,N), Cholesky(N),
triangular solve, logdet. This isolates each part at production shape
(width B candidates, N=500) so throughput work targets the real wall.

Usage: python tools/microbench_search_iter.py [B] [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, n=20, warmup=3):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    import waveome_tpu
    from waveome_tpu.kernels import full_kernel_build, fused
    from waveome_tpu.models import svgp

    waveome_tpu.set_precision("float32")
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 500

    rng = np.random.default_rng(0)
    n_units = 50
    ids = np.repeat(np.arange(n_units), N // n_units).astype(np.float64)
    tcol = np.tile(np.linspace(-2, 2, N // n_units), n_units)
    female = np.repeat((np.arange(n_units) % 2).astype(np.float64),
                       N // n_units)
    X_np = np.column_stack([ids, tcol, female])
    Y_np = rng.normal(size=(N, 1))

    spec, _ = full_kernel_build(
        cat_vars=[0, 2], num_vars=[1], unit_idx=0,
        var_names=["id", "time", "female"], return_sum=True,
    )
    C = spec.num_components
    F = max(spec.max_factors, 2)

    config = svgp.make_config(spec, "gaussian", num_data=N, input_dim=3,
                              num_inducing_points=N, coded_structure=True,
                              coded_ops=tuple(sorted({
                                  p.code for c in spec.components
                                  for p in c})))
    X = jnp.asarray(X_np, dtype=jnp.float32)
    Y = jnp.asarray(Y_np, dtype=jnp.float32)
    params = svgp.init_params(config, X, dtype=jnp.float32)
    coded1 = spec.padded(C, F).coded()

    layout, cl_keys, routing = fused.build_layout([spec], 3, C, F)
    banks = fused.build_banks(layout, cl_keys, X)
    coded1f = dict(coded1, **{k: jnp.asarray(v[0]) for k, v in
                              routing.items()})
    config_f = __import__("dataclasses").replace(config,
                                                 fused_layout=layout)

    # batch: B copies with parameter noise
    raws = jnp.stack([
        params["kernel_raw"] + 0.05 * jax.random.normal(
            jax.random.PRNGKey(i), params["kernel_raw"].shape)
        for i in range(B)
    ])
    codedB = jax.tree.map(lambda a: jnp.stack([jnp.asarray(a)] * B), coded1)
    codedBf = jax.tree.map(lambda a: jnp.stack([jnp.asarray(a)] * B),
                           coded1f)

    from waveome_tpu.kernels.gram import gram_coded

    # 1. batched coded gram (switch dispatch)
    f_gram = jax.jit(jax.vmap(lambda c, r: gram_coded(c, r, X, X)))
    t = timeit(f_gram, codedB, raws)
    print(f"gram_coded       B={B} N={N}: {t*1e3:8.2f} ms")

    # 2. batched fused gram
    f_gramf = jax.jit(jax.vmap(
        lambda c, r: fused.gram_coded_fused(layout, c, r, banks)))
    t = timeit(f_gramf, codedBf, raws)
    print(f"gram_fused       B={B} N={N}: {t*1e3:8.2f} ms")

    # 3. batched Cholesky alone
    Ks = jax.block_until_ready(f_gram(codedB, raws))
    Ks = Ks + 0.1 * jnp.eye(N)
    f_chol = jax.jit(jnp.linalg.cholesky)
    t = timeit(f_chol, Ks)
    flops = B * N ** 3 / 3
    print(f"cholesky         B={B} N={N}: {t*1e3:8.2f} ms "
          f"({flops/t/1e12:.2f} TFLOP/s)")

    # 4. batched triangular solve (N,1)
    Ls = jax.block_until_ready(f_chol(Ks))
    f_solve = jax.jit(jax.vmap(
        lambda L: jax.scipy.linalg.solve_triangular(L, Y, lower=True)))
    t = timeit(f_solve, Ls)
    print(f"tri_solve(N,1)   B={B} N={N}: {t*1e3:8.2f} ms")

    # 5. full objective eval (gram+chol+solve+logdet), value only
    def mll(coded_i, raw_i):
        p = dict(params, kernel_raw=raw_i)
        return svgp.exact_mll(config, p, X, Y, coded=coded_i)

    f_val = jax.jit(jax.vmap(mll))
    t_val = timeit(f_val, codedB, raws)
    print(f"exact_mll value  B={B} N={N}: {t_val*1e3:8.2f} ms")

    def mllf(coded_i, raw_i):
        p = dict(params, kernel_raw=raw_i)
        return svgp.exact_mll(config_f, p, X, Y, coded=coded_i,
                              banks=banks)

    f_valf = jax.jit(jax.vmap(mllf))
    t_valf = timeit(f_valf, codedBf, raws)
    print(f"exact_mll fused  B={B} N={N}: {t_valf*1e3:8.2f} ms")

    # 6. value_and_grad
    f_vg = jax.jit(jax.vmap(jax.value_and_grad(lambda r, c: mll(c, r))))
    t_vg = timeit(f_vg, raws, codedB)
    print(f"exact_mll v&g    B={B} N={N}: {t_vg*1e3:8.2f} ms")

    f_vgf = jax.jit(jax.vmap(jax.value_and_grad(lambda r, c: mllf(c, r))))
    t_vgf = timeit(f_vgf, raws, codedBf)
    print(f"exact_mll v&g fused B={B} N={N}: {t_vgf*1e3:8.2f} ms")

    # 7. one full plbfgs iteration equivalent: 4 value evals + 1 v&g
    per_iter = 4 * t_valf + t_vgf
    print(f"\nper-iteration equivalent (4 trials + v&g, fused): "
          f"{per_iter*1e3:.2f} ms -> at 40 iters: {per_iter*40:.2f} s "
          f"per {B}-wide dispatch")
    print(f"implied fits/min at p50=40 iters, width {B}: "
          f"{B / (per_iter*40) * 60:.0f}")


if __name__ == "__main__":
    main()
