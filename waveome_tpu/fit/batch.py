"""Batched per-outcome fitting engine — the Ray replacement.

The reference fits each outcome column in its own Ray worker process
(model_search.py:250-500; ~0.3 models/min on CPU, BASELINE.md). Here all
outcomes sharing the saturated kernel structure are stacked on a leading
axis, the full penalized pipeline (fit → factor iteration → prune →
importances) is vmapped, and the batch axis is sharded over the device
mesh. One XLA program fits the whole batch.
"""

from __future__ import annotations

from functools import lru_cache

from .._variants import variant_logged
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.spec import KernelSpec
from ..likelihoods import needs_loss_guard
from ..models import svgp
from ..optimize.lbfgs import lbfgs_fit
from ..optimize.plbfgs import plbfgs_fit
from ..parallel import mesh as meshlib
from .penalized import (
    PenalizedFitResult,
    auto_penalization_factor,
    penalized_fit,
)


class BatchFitResult(NamedTuple):
    config: object
    results: PenalizedFitResult  # leading axis = outcomes
    num_outcomes: int

    def for_outcome(self, i: int) -> PenalizedFitResult:
        return jax.tree.map(lambda a: a[i], self.results)


def fit_outcomes_penalized(
    X,
    Ys,
    spec: KernelSpec,
    likelihood: str = "gaussian",
    num_inducing_points: int = 500,
    penalization_factor: Optional[float] = None,
    num_factor_iter: int = 5,
    num_restart: int = 0,
    max_iter: int = 500,
    var_cutoff: float = 0.1,
    importance_type: str = "log_bf",
    use_mesh: bool = True,
    devices: Optional[Sequence] = None,
    seed: int = 0,
    compute_importances: bool = True,
    dtype=None,
    device_chunk: Optional[int] = None,
    objective: str = "auto",
    cg_iters: int = 50,
    cg_probes: int = 8,
    batch_size: Optional[int] = None,
) -> BatchFitResult:
    """Fit every column of ``Ys`` (N, B) with the penalized pipeline.

    Equivalent of one whole `penalized_optimization` outcome batch
    (model_search.py:411-500), as a single sharded XLA program.
    """
    from ..config import default_float

    dtype = dtype or default_float()
    # NOTE: keep host copies for closure-free jit argument passing — a
    # device array captured in a jit closure forces a device→host readback
    # at LOWERING time (catastrophically slow over remote-TPU tunnels).
    X_np = np.asarray(X, dtype=np.float64)
    Ys_np = np.asarray(Ys, dtype=np.float64)
    N, B = Ys_np.shape

    config = svgp.make_config(
        spec, likelihood, num_data=N, input_dim=X_np.shape[1],
        num_inducing_points=num_inducing_points,
    )
    params0 = jax.tree.map(
        np.asarray,
        svgp.init_params(config, jnp.asarray(X_np, dtype=dtype),
                         key=jax.random.PRNGKey(seed), dtype=dtype),
    )

    # staged execution: (1) optimize, (2) prune + importances. Separate
    # jitted programs compile faster, cache better, and avoid the giant
    # fused graphs that stress experimental TPU backends.
    from .penalized import penalized_finalize

    # No-factor-iteration case: segmented optimization — the whole
    # outcome batch advances ``segment_iters`` iterations per device call
    # (bounded call duration for remote transports, full batch width for
    # utilization), with optimizer state carried across calls and batch
    # compaction between segments. Gaussian outcomes run collapsed-bound
    # L-BFGS; non-Gaussian run the joint-(q, θ) Adam+NatGrad loop. Under
    # a multi-device mesh the outcome axis is sharded (each device
    # carries B/n_dev outcomes of every segment).
    segmented = (
        num_factor_iter == 0
        and num_restart == 0
        and batch_size is None
    )
    if segmented:
        mesh = (
            meshlib.outcome_mesh(devices)
            if use_mesh and len(devices or jax.devices()) > 1
            else None
        )
        results = _segmented_gaussian_fit(
            config, params0, X_np, Ys_np,
            penalization_factor=penalization_factor,
            max_iter=max_iter,
            segment_iters=device_chunk_iters(device_chunk, max_iter, B),
            var_cutoff=var_cutoff,
            importance_type=importance_type,
            compute_importances=compute_importances,
            dtype=dtype,
            seed=seed,
            objective=objective,
            cg_iters=cg_iters,
            cg_probes=cg_probes,
            mesh=mesh,
        )
        return BatchFitResult(config=config, results=results,
                              num_outcomes=B)

    def fit_stage(y, key, X, p0):
        return penalized_fit(
            config, p0, X, y[:, None],
            penalization_factor=penalization_factor,
            num_factor_iter=num_factor_iter,
            num_restart=num_restart,
            max_iter=max_iter,
            key=key,
            stage="fit",
            batch_size=batch_size,
        )

    def finalize_stage(res, y, X):
        cm, fm, imp = penalized_finalize(
            config, res.params, X, y[:, None],
            var_cutoff=var_cutoff,
            importance_type=importance_type,
            compute_importances=compute_importances,
        )
        return res._replace(component_mask=cm, factor_mask=fm,
                            importances=imp)

    # exp-link likelihoods get the per-outcome GLM mean init (see the
    # segmented branch above for why); p0 is then vmapped over outcomes
    exp_link = config.likelihood.name in (
        "poisson", "gamma", "exponential", "negative_binomial",
        "zeroinflated_negativebinomial",
    )
    p0_axis = 0 if exp_link else None
    fit_fn = jax.jit(jax.vmap(fit_stage, in_axes=(0, 0, None, p0_axis)))
    fin_fn = jax.jit(jax.vmap(finalize_stage, in_axes=(0, 0, None)))

    def fn(ys, keys, X_dev, p0_dev):
        res = fit_fn(ys, keys, X_dev, p0_dev)
        return fin_fn(res, ys, X_dev)
    X_dev = jnp.asarray(X_np, dtype=dtype)
    p0_dev = jax.tree.map(lambda a: jnp.asarray(a, dtype=dtype), params0)
    if exp_link:
        def batch_p0(ys_cols):
            ybar = jnp.maximum(jnp.mean(ys_cols, axis=1), 1e-6)
            p0b = jax.tree.map(
                lambda a: jnp.broadcast_to(
                    a, (ys_cols.shape[0],) + a.shape), p0_dev)
            p0b = dict(p0b)
            p0b["mean_c"] = jnp.log(ybar)[:, None].astype(dtype)
            return p0b
    else:
        def batch_p0(ys_cols):
            return p0_dev

    if use_mesh and len(devices or jax.devices()) > 1:
        m = meshlib.outcome_mesh(devices)
        n_dev = len(m.devices.reshape(-1))
        B_pad = meshlib.pad_batch(B, n_dev)
        Ys_cols = jnp.asarray(
            np.concatenate(
                [Ys_np.T, np.ones((B_pad - B, N))], axis=0
            ), dtype=dtype,
        )
        keys = jax.random.split(jax.random.PRNGKey(seed), B_pad)
        Ys_cols = meshlib.shard_leading_axis(Ys_cols, m)
        keys = meshlib.shard_leading_axis(keys, m)
        X_dev = meshlib.replicate(X_dev, m)
        p0_dev = meshlib.replicate(p0_dev, m)
        results = fn(Ys_cols, keys, X_dev, batch_p0(Ys_cols))
        results = jax.tree.map(lambda a: a[:B], results)
    else:
        keys = jax.random.split(jax.random.PRNGKey(seed), B)
        Ys_dev = jnp.asarray(Ys_np.T, dtype=dtype)
        if device_chunk is None or device_chunk >= B:
            results = fn(Ys_dev, keys, X_dev, batch_p0(Ys_dev))
        else:
            # Bounded-duration device calls: some remote-TPU transports
            # kill long-running single executions. Outcomes are
            # independent, so chunked calls are semantically identical;
            # async dispatch keeps the device busy across chunks.
            chunk = device_chunk
            B_pad = ((B + chunk - 1) // chunk) * chunk
            if B_pad != B:
                Ys_dev = jnp.concatenate(
                    [Ys_dev, jnp.ones((B_pad - B, N), dtype=dtype)], axis=0
                )
                keys = jnp.concatenate(
                    [keys, keys[: B_pad - B]], axis=0
                )
            parts = []
            for lo in range(0, B_pad, chunk):
                parts.append(fn(Ys_dev[lo:lo + chunk],
                                keys[lo:lo + chunk], X_dev,
                                batch_p0(Ys_dev[lo:lo + chunk])))
            results = jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0)[:B], *parts
            )

    return BatchFitResult(config=config, results=results, num_outcomes=B)


def device_chunk_iters(device_chunk, max_iter: int, batch: int = 1) -> int:
    """Segment length heuristic: keep each device call's duration bounded
    regardless of batch width (remote transports kill long executions).
    The parallel-linesearch optimizer has constant per-iteration depth, so
    segments can be longer than with a sequential linesearch."""
    if device_chunk is None:
        return max_iter
    return max(10, min(100, max_iter, 16384 // max(batch, 1)))


def _segmented_gaussian_fit(
    config,
    params0_np,
    X_np,
    Ys_np,
    penalization_factor,
    max_iter: int,
    segment_iters: int,
    var_cutoff: float,
    importance_type: str,
    compute_importances: bool,
    dtype,
    seed: int,
    objective: str = "auto",
    cg_iters: int = 50,
    cg_probes: int = 8,
    mesh=None,
) -> PenalizedFitResult:
    """Whole-batch Gaussian penalized fits via segmented L-BFGS.

    Semantics identical to penalized_fit(collapsed, num_factor_iter=0):
    exact MLL (M=N) / collapsed bound (M<N) + horseshoe prior, optimal-q
    materialization, pruning, importances.

    ``objective``: "cholesky" evaluates the exact dense MLL;
    "iterative" optimizes the matmul-only CG/SLQ surrogate
    (models/iterative.py — the BBMM fast path; final losses are
    recomputed exactly); "auto" picks iterative on the float32
    exact-Gaussian TPU path and cholesky elsewhere.
    """
    N, B = Ys_np.shape
    num_var = config.spec.num_variance_prior_params()
    gaussian = config.likelihood.name == "gaussian"
    exact_gaussian = gaussian and config.num_inducing >= N
    f32_mode = dtype == jnp.float32
    # "auto" = Cholesky at EVERY N (round-3 chip measurement,
    # BENCH_WORKLOAD=largen at N=2048 B=16: dense Cholesky 8.5 s vs the
    # two-phase CG/SLQ surrogate 499 s — XLA's batched factorization
    # reaches ~3.4 TFLOP/s at this size, and the surrogate's savings are
    # repaid rebuilding L-BFGS curvature at the exact objective; the
    # round-2 'switch above N=2000' rule was a CPU-test extrapolation
    # that inverts on hardware). The matmul-only path stays available as
    # objective='iterative' for memory-bound regimes (K no longer fits
    # HBM alongside the batch).
    iterative = objective == "iterative"
    if iterative and not exact_gaussian:
        raise ValueError(
            "objective='iterative' requires the exact Gaussian path (M=N)")

    # per-outcome auto factor (host): 2·1.1·σ̂·√N·Φ⁻¹(1−0.1/2p) with σ̂=1
    # for the no-iteration case (model_search.py:279-283)
    if penalization_factor is None:
        factors_np = np.full(
            B, float(auto_penalization_factor(1.0, N, num_var))
        )
    else:
        factors_np = np.full(B, float(penalization_factor))

    X_dev = jnp.asarray(X_np, dtype=dtype)
    p0_dev = jax.tree.map(lambda a: jnp.asarray(a, dtype=dtype), params0_np)
    if iterative:
        from ..models.iterative import make_probes

        probes_dev = make_probes(jax.random.PRNGKey(seed + 7919), N,
                                 cg_probes, dtype)
    else:
        probes_dev = jnp.zeros((N, 1), dtype=dtype)
    data = (X_dev, p0_dev, probes_dev)

    # mesh mode: pad the outcome axis to a device multiple and shard it;
    # everything else replicates (the ray.put broadcast analogue)
    n_dev = len(mesh.devices.reshape(-1)) if mesh is not None else 1
    B_pad = meshlib.pad_batch(B, n_dev)
    if B_pad != B:
        Ys_np = np.concatenate(
            [Ys_np, np.ones((N, B_pad - B))], axis=1)
        factors_np = np.concatenate(
            [factors_np, np.full(B_pad - B, factors_np[0])])
    Ys_dev = jnp.asarray(Ys_np.T[:, :, None], dtype=dtype)
    factors = jnp.asarray(factors_np, dtype=dtype)
    if mesh is not None:
        Ys_dev = meshlib.shard_leading_axis(Ys_dev, mesh)
        factors = meshlib.shard_leading_axis(factors, mesh)
        data = meshlib.replicate(data, mesh)

    def run_segments(fns, p0_batched, budget, res_prev=None):
        """Segmented loop with batch compaction: converged outcomes are
        dropped between segments and survivors repacked into power-of-two
        buckets, so late stragglers don't drag the whole batch width
        through every remaining segment. Each bucket width is its own
        (cached) XLA program. ``p0_batched``: optional per-outcome start
        params (phase handoff); else the shared init is used."""
        first_fn, next_fn, first_b_fn = fns
        bound = min(segment_iters, budget)
        if p0_batched is None:
            res, carry = first_fn(Ys_dev, factors, jnp.asarray(bound),
                                  data)
        else:
            res, carry = first_b_fn(Ys_dev, factors, jnp.asarray(bound),
                                    p0_batched, data)
        res_full = res
        idx_cur = np.arange(B_pad)  # current-batch position -> column
        n_valid = B_pad
        carry_cur, ys_cur, fac_cur = carry, Ys_dev, factors
        while bound < budget:
            conv = np.asarray(res.converged)[:n_valid]
            active = np.nonzero(~conv)[0]
            if active.size == 0:
                break
            width = len(idx_cur)
            target = meshlib.pad_batch(
                max(8, n_dev, 1 << int(np.ceil(np.log2(active.size)))),
                n_dev,
            )
            if target <= width // 2:
                sel = np.concatenate(
                    [active, np.repeat(active[:1], target - active.size)]
                )
                take = jnp.asarray(sel)
                carry_cur = jax.tree.map(lambda a: a[take], carry_cur)
                ys_cur = ys_cur[take]
                fac_cur = fac_cur[take]
                idx_cur = idx_cur[sel]
                n_valid = active.size
                if mesh is not None:
                    carry_cur = meshlib.shard_leading_axis(carry_cur, mesh)
                    ys_cur = meshlib.shard_leading_axis(ys_cur, mesh)
                    fac_cur = meshlib.shard_leading_axis(fac_cur, mesh)
            bound = min(bound + segment_iters, budget)
            res, carry_cur = next_fn(carry_cur, ys_cur, fac_cur,
                                     jnp.asarray(bound), data)
            put = jnp.asarray(idx_cur[:n_valid])
            res_full = jax.tree.map(
                lambda full, part: full.at[put].set(part[:n_valid]),
                res_full, res,
            )
        return res_full

    # WAVEOME_FIT_PROFILE=1: stage anatomy of a penalized batch (where
    # the iHMP 13.7-minute wall clock goes — optimize segments vs the
    # prune+importance finalize sweep)
    import os as _os
    import time as _time

    _prof = _os.environ.get("WAVEOME_FIT_PROFILE", "0") == "1"
    _t_fit0 = _time.perf_counter()

    if not gaussian:
        # joint-(q, θ) Adam+NatGrad segments (the reference's optimizer
        # for large parameter sets, model_classes.py:344-470).
        # Per-outcome GLM-style mean init: for exp-link likelihoods the
        # constant mean starts at log(mean(y)) instead of 0 — at real
        # count scales (iHMP intensities ~1e10) a zero init puts the
        # model mean e^14 away from the data, the first NatGrad step
        # explodes, and the NaN rollback silently freezes the fit at its
        # initial parameters (observed on the real metabolome; classic
        # GLM initialization fixes it at the root).
        exp_link = config.likelihood.name in (
            "poisson", "gamma", "exponential", "negative_binomial",
            "zeroinflated_negativebinomial",
        )
        if exp_link:
            ybar = np.maximum(Ys_np.T.mean(axis=1), 1e-6)  # (B_pad,)
            mean0 = np.log(ybar).astype(np.dtype(dtype))
            p0b_np = jax.tree.map(
                lambda a: np.broadcast_to(
                    np.asarray(a), (B_pad,) + np.asarray(a).shape).copy(),
                jax.tree.map(np.asarray, p0_dev),
            )
            p0b_np["mean_c"] = mean0[:, None]
            p0_batched = jax.tree.map(
                lambda a: jnp.asarray(a, dtype=dtype), p0b_np)
            if mesh is not None:
                p0_batched = meshlib.shard_leading_axis(p0_batched, mesh)
        else:
            p0_batched = None
        res = run_segments(
            _seg_adam_fns(config, np.dtype(dtype).name), p0_batched,
            max_iter,
        )
    elif iterative:
        # Two-phase: most iterations ride the cheap matmul-only surrogate,
        # then the exact Cholesky objective refines from those params —
        # restoring exact line-search rejections (the surrogate can drift
        # into regions where the exact f32 Cholesky fails) and exact
        # convergence decisions.
        budget1 = max(segment_iters, int(max_iter * 0.6))
        res1 = run_segments(
            _seg_fit_fns(config, exact_gaussian, True, cg_iters,
                         np.dtype(dtype).name),
            None, budget1,
        )
        fns_exact = _seg_fit_fns(config, exact_gaussian, False, cg_iters,
                                 np.dtype(dtype).name)
        res = run_segments(fns_exact, res1.params,
                           max(segment_iters, max_iter - budget1))
        res = res._replace(num_iters=res.num_iters + res1.num_iters)
    else:
        res = run_segments(
            _seg_fit_fns(config, exact_gaussian, False, cg_iters,
                         np.dtype(dtype).name),
            None, max_iter,
        )
    if _prof:
        jax.block_until_ready(res.loss)
        print(f"[fit-prof] optimize B={B} lik={config.likelihood.name} "
              f"elapsed={_time.perf_counter() - _t_fit0:.2f}s "
              f"iters_p50={int(np.percentile(np.asarray(res.num_iters)[:B], 50))} "
              f"max={int(np.asarray(res.num_iters)[:B].max())}",
              flush=True)
    _t_fin0 = _time.perf_counter()

    if B_pad != B:
        res = jax.tree.map(lambda a: a[:B], res)
        Ys_dev = Ys_dev[:B]
        factors = factors[:B]

    # optimal-q materialization + finalize in bounded outcome chunks
    # (the iterative mode's phase-2 refinement runs the exact objective,
    # so res.loss is always an exact value)
    q_fn, fin_fn, _ = _seg_final_fns(
        config, float(var_cutoff), importance_type,
        bool(compute_importances), exact_gaussian, f32_mode,
        np.dtype(dtype).name,
    )

    # bound the finalize chunk by live memory, not just count: optimal_q
    # holds several (chunk, M, M) temps at once, so keep
    # chunk x M^2 x 4B under ~512 MB (M=500 → 32; M=4096 → 7)
    M_ind = config.num_inducing
    FIN_CHUNK = max(1, min(32, (512 << 20) // (4 * M_ind * M_ind)))
    p_parts, cm_parts, fm_parts, imp_parts = [], [], [], []
    for lo in range(0, B, FIN_CHUNK):
        sl = slice(lo, min(lo + FIN_CHUNK, B))
        p_i = jax.tree.map(lambda a: a[sl], res.params)
        y_i = Ys_dev[sl]
        if gaussian:
            # closed-form optimal q (the optimizer only carried the
            # hyperparameters); non-Gaussian fits optimize q explicitly
            p_i = q_fn(p_i, y_i, X_dev)
        cm_i, fm_i, imp_i = fin_fn(p_i, y_i, X_dev)
        p_parts.append(p_i)
        cm_parts.append(cm_i)
        fm_parts.append(fm_i)
        imp_parts.append(imp_i)
    params = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0),
                          *p_parts)
    cm = jnp.concatenate(cm_parts, axis=0)
    fm = jnp.concatenate(fm_parts, axis=0)
    imp = jnp.concatenate(imp_parts, axis=0)
    if _prof:
        jax.block_until_ready(imp)
        print(f"[fit-prof] finalize B={B} chunks="
              f"{-(-B // FIN_CHUNK)} chunk={FIN_CHUNK} "
              f"elapsed={_time.perf_counter() - _t_fin0:.2f}s",
              flush=True)
    loss = res.loss
    return PenalizedFitResult(
        params=params,
        penalization_factor=factors,
        component_mask=cm,
        factor_mask=fm,
        importances=imp,
        loss=loss,
        num_iters=res.num_iters,
    )


@variant_logged
@lru_cache(maxsize=64)
def _seg_fit_fns(config, exact_gaussian: bool, iterative: bool,
                 cg_iters: int, dtype_name: str):
    """Jitted segment steppers, cached on the static configuration.

    Module-level + lru_cache: per-call closures would make jax.jit
    re-trace and re-lower the whole segmented L-BFGS program on every
    ``fit_outcomes_penalized`` call even with a warm compile cache.
    """
    dtype = jnp.dtype(dtype_name)
    f32_mode = dtype == jnp.float32
    tol = 3e-5 if f32_mode else 1e-8
    var_cap = 1e3
    M, D = config.num_inducing, config.input_dim
    # large-N memory guard: the vmapped 4-trial line search multiplies
    # the objective's live gram memory by the trial count — at N=4096,
    # B=32 that is a (B, 4, N²) buffer past a v5e HBM. Sequential trials
    # (lax.map) keep the FLOPs and trial values identical; the outcome
    # batch axis still fills the chip (optimize/plbfgs.py).
    trial_sequential = M >= 2048
    dummy = svgp.init_params(config, jnp.zeros((M, D), dtype=dtype),
                             key=jax.random.PRNGKey(0), dtype=dtype)
    mask_np = jax.tree.map(np.asarray, svgp.train_mask(config, dummy))
    for k in ("q_mu", "q_sqrt_raw"):
        mask_np[k] = np.zeros_like(mask_np[k])
    if exact_gaussian:
        mask_np["z"] = np.zeros_like(mask_np["z"])

    def make_loss(y, factor, X, probes):
        def loss(p):
            if iterative:
                from ..models.iterative import exact_mll_iterative

                fitobj = exact_mll_iterative(config, p, X, y, probes,
                                             n_iter=cg_iters)
            elif exact_gaussian:
                fitobj = svgp.exact_mll(config, p, X, y)
            else:
                fitobj = svgp.collapsed_elbo(config, p, X, y)
            obj = fitobj + svgp.log_prior_density(config, p, factor)
            if f32_mode:
                from ..kernels.gram import component_variances as _cv

                v = _cv(config.spec, p["kernel_raw"])
                obj = obj - jnp.sum(jax.nn.relu(v - var_cap) ** 2)
            return -obj

        return loss

    # Parallel-linesearch L-BFGS: the trial grid evaluates in ONE batched
    # call, so the per-iteration sequential depth is constant — under vmap
    # a sequential linesearch costs every member the slowest member's
    # trial count (optimize/plbfgs.py). Same losses/masks as the zoom
    # variant on this objective.
    # line-search trials can route through the forward-only Pallas gram
    # on eligible shapes (WAVEOME_PALLAS_TRIALS=1 opt-in; kernels/gram.py
    # forward_pallas) — the gradient evaluation keeps the plain XLA gram
    from ..kernels.gram import forward_pallas

    def first_seg(y, factor, bound, data):
        X, p0, probes = data
        loss = make_loss(y, factor, X, probes)
        return plbfgs_fit(loss, p0,
                          mask=mask_np, max_iter=bound, tol=tol,
                          trial_loss_fn=forward_pallas(loss),
                          trial_sequential=trial_sequential,
                          return_carry=True)

    def next_seg(carry, y, factor, bound, data):
        X, p0, probes = data
        loss = make_loss(y, factor, X, probes)
        return plbfgs_fit(loss, p0,
                          mask=mask_np, max_iter=bound, tol=tol,
                          trial_loss_fn=forward_pallas(loss),
                          trial_sequential=trial_sequential,
                          carry=carry, return_carry=True)

    def first_seg_b(y, factor, bound, p0, data):
        # per-outcome start params (phase handoff between objectives)
        X, _, probes = data
        loss = make_loss(y, factor, X, probes)
        return plbfgs_fit(loss, p0,
                          mask=mask_np, max_iter=bound, tol=tol,
                          trial_loss_fn=forward_pallas(loss),
                          trial_sequential=trial_sequential,
                          return_carry=True)

    first_fn = jax.jit(jax.vmap(first_seg, in_axes=(0, 0, None, None)))
    next_fn = jax.jit(jax.vmap(next_seg, in_axes=(0, 0, 0, None, None)))
    first_b_fn = jax.jit(jax.vmap(first_seg_b,
                                  in_axes=(0, 0, None, 0, None)))
    # (carry is vmapped axis 0; bound and data broadcast)
    return first_fn, next_fn, first_b_fn


@variant_logged
@lru_cache(maxsize=64)
def _seg_adam_fns(config, dtype_name: str):
    """Jitted Adam+NatGrad segment steppers for the non-Gaussian
    (explicit-q) penalized path — same segment/carry/compaction protocol
    as the L-BFGS steppers in ``_seg_fit_fns``."""
    from ..optimize.adam import adam_natgrad_fit

    dtype = jnp.dtype(dtype_name)
    f32_mode = dtype == jnp.float32
    var_cap = 1e3
    guard = needs_loss_guard(config.likelihood.name)
    M, D = config.num_inducing, config.input_dim
    dummy = svgp.init_params(config, jnp.zeros((max(M, 1), D), dtype=dtype),
                             key=jax.random.PRNGKey(0), dtype=dtype)
    mask_np = jax.tree.map(np.asarray, svgp.train_mask(config, dummy))

    def make_loss(y, factor, X):
        def loss(p):
            obj = svgp.training_loss(config, p, X, y,
                                     penalization_factor=factor)
            if f32_mode:
                from ..kernels.gram import component_variances as _cv

                v = _cv(config.spec, p["kernel_raw"])
                obj = obj + jnp.sum(jax.nn.relu(v - var_cap) ** 2)
            return obj

        return loss

    def first_seg(y, factor, bound, data):
        X, p0, _probes = data
        return adam_natgrad_fit(make_loss(y, factor, X), p0,
                                mask=mask_np, num_opt_iter=bound,
                                return_carry=True, loss_guard=guard)

    def next_seg(carry, y, factor, bound, data):
        X, p0, _probes = data
        return adam_natgrad_fit(make_loss(y, factor, X), p0,
                                mask=mask_np, num_opt_iter=bound,
                                carry=carry, return_carry=True, loss_guard=guard)

    def first_seg_b(y, factor, bound, p0, data):
        X, _, _probes = data
        return adam_natgrad_fit(make_loss(y, factor, X), p0,
                                mask=mask_np, num_opt_iter=bound,
                                return_carry=True, loss_guard=guard)

    first_fn = jax.jit(jax.vmap(first_seg, in_axes=(0, 0, None, None)))
    next_fn = jax.jit(jax.vmap(next_seg, in_axes=(0, 0, 0, None, None)))
    first_b_fn = jax.jit(jax.vmap(first_seg_b,
                                  in_axes=(0, 0, None, 0, None)))
    return first_fn, next_fn, first_b_fn


@variant_logged
@lru_cache(maxsize=64)
def _seg_final_fns(config, var_cutoff: float, importance_type: str,
                   compute_importances: bool, exact_gaussian: bool,
                   f32_mode: bool, dtype_name: str):
    from .penalized import penalized_finalize

    def qstep(p, y, X):
        q_mu, q_sqrt = svgp.optimal_q(config, p, X, y)
        return dict(p, q_mu=q_mu, q_sqrt_raw=q_sqrt)

    def finalize(p, y, X):
        return penalized_finalize(
            config, p, X, y, var_cutoff=var_cutoff,
            importance_type=importance_type,
            compute_importances=compute_importances,
        )

    def exact_loss(p, y, X, factor):
        fitobj = (svgp.exact_mll(config, p, X, y) if exact_gaussian
                  else svgp.collapsed_elbo(config, p, X, y))
        return -(fitobj + svgp.log_prior_density(config, p, factor))

    return (
        jax.jit(jax.vmap(qstep, in_axes=(0, 0, None))),
        jax.jit(jax.vmap(finalize, in_axes=(0, 0, None))),
        jax.jit(jax.vmap(exact_loss, in_axes=(0, 0, None, 0))),
    )
