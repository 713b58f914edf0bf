"""Batched candidate fitting for the kernel-structure search.

The reference's ``kernel_test`` (model_search.py:2239-2334) fits ONE
candidate kernel at a time — (restarts × candidates × features) sequential
L-BFGS fits are the search's hot loop (SURVEY.md §3.3). Here every
candidate of an expansion step is padded to a common (C, F) op-code shape
and ALL (candidate × restart) fits run as a single vmapped coded-structure
L-BFGS program. Compilations are cached per padded shape, so an entire
search incurs only a handful of compiles.
"""

from __future__ import annotations

import dataclasses
import os
from functools import lru_cache

from .._variants import variant_logged
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import default_float
from ..kernels import fused as _fused
from ..kernels.spec import KernelSpec
from ..likelihoods import needs_loss_guard
from ..models import svgp
from ..optimize.plbfgs import plbfgs_fit


# cumulative count of candidate fits (pre-padding) across all
# fit_candidates calls this process — the search-throughput bench reads
# this to report "candidate fits/min" (the BASELINE.md north-star unit,
# equivalent to counting the reference's kernel_test invocations)
FIT_COUNT = 0


class CandidateFit(NamedTuple):
    params: dict  # stacked over candidates
    loglik: np.ndarray  # (n_cand,) log posterior (= ELBO, no priors)
    holdout: Optional[np.ndarray]  # (n_cand,) holdout log density sum
    bic: np.ndarray  # (n_cand,)
    iters: Optional[np.ndarray] = None  # (n_cand,) optimizer iterations
    # of the winning restart (Gaussian path only; None for segmented
    # fits) — lockstep-straggler diagnostics for WAVEOME_SEARCH_PROFILE


def _stack_coded(specs: Sequence[KernelSpec], C: int, F: int):
    coded = [s.padded(C, F).coded() for s in specs]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *coded)


@lru_cache(maxsize=8192)
def _spec_prep(spec: KernelSpec, C: int, F: int, dtype_name: str):
    """Per-(spec, shape) host prep, cached across fit_candidates calls:
    (coded numpy dict, init raw (C,F,P) f64, train mask (C,F,P) bool,
    frozenset of op codes). dtype_name keys the cache because
    ``coded_np`` bakes ``default_float`` into the degrees leaf."""
    sp = spec.padded(C, F)
    return (sp.coded_np(), sp.init_raw_params_np(), sp.train_mask_np(),
            frozenset(p.code for comp in spec.components for p in comp))


def _bucket(n: int, buckets) -> int:
    """Round n up to the next bucket (last bucket's granularity above)."""
    for b in buckets:
        if n <= b:
            return b
    step = buckets[-1] - buckets[-2] if len(buckets) > 1 else buckets[-1]
    return buckets[-1] + ((n - buckets[-1] + step - 1) // step) * step


def _slice_widths(flat: int, cap: int, mesh_size: int = 1):
    """Sub-batch widths for an oversized candidate batch: cap-wide slices
    plus ONE final smaller bucketed slice. The trailing remainder
    re-buckets down (e.g. flat=179, cap=128 → [128, 64]) instead of
    padding to a full cap multiple — the trailing slice of a
    179-candidate expansion was 60% padding (search-prof receipt,
    round 4). Every width stays in the compiled-program set
    ({cap} ∪ buckets ≤ cap), so the program family grows by at most one
    smaller width."""
    buckets_le = tuple(b for b in _WIDTH_BUCKETS if b <= cap) or (cap,)
    widths = []
    rem = flat
    while rem > cap:
        widths.append(cap)
        rem -= cap
    if rem:
        w = min(_bucket(rem, buckets_le), cap)
        if mesh_size > 1:
            w = -(-w // mesh_size) * mesh_size
        widths.append(w)
    return widths


# Width/shape buckets: every distinct (n_cand, C, F) combination is its own
# XLA program, and a greedy search sweeps dozens of candidate counts and a
# new component count per depth — unbucketed, that's a compile per
# expansion step (the round-1 test-suite blowup). Bucketing pads candidates
# (dup of slot 0, masked out of results) and kernel shape (EMPTY ops) so an
# entire search reuses a handful of compiled programs across depths, and
# repeat searches hit the persistent cache.
# coarse width buckets: each bucket is one XLA program per (C, F) shape,
# and cold compiles (~20-80s each) dominate search wall time on CPU —
# fewer buckets beats tighter padding. 32 earns its compile: depth-1
# expansions land in the 17-32 range for every few-kernel search (the
# bench shape pads 28→32 instead of 28→64, saving ~half that dispatch)
_WIDTH_BUCKETS = (4, 16, 32, 64, 128, 256)
_C_BUCKETS = (1, 2, 3, 4, 6, 8, 12, 16, 20, 24)
_F_BUCKETS = (2, 3, 4, 6, 8)


@variant_logged
@lru_cache(maxsize=128)
def _fit_all_fn(config, split: bool, n_fits: int, max_iter: int,
                dtype_name: str):
    """Jitted vmapped candidate fitter, cached on the static configuration.

    Module-level + lru_cache so repeated ``fit_candidates`` calls reuse one
    traced program. A per-call closure would make jax.jit re-trace and
    re-lower the whole L-BFGS while_loop on EVERY expansion step (~2 min
    per call on CPU) even when the persistent compile cache is warm.
    """
    dtype = jnp.dtype(dtype_name)
    M = config.num_inducing

    def one_fit(coded_i, raw_i, kmask_i, key, randomize, data, y_col):
        X, Ymat, tmpl, Xh, Yhmat, banks = data
        Y = jax.lax.dynamic_slice_in_dim(Ymat, y_col, 1, axis=1)
        Yh = jax.lax.dynamic_slice_in_dim(Yhmat, y_col, 1, axis=1)
        mask = {
            "kernel_raw": kmask_i > 0,
            "mean_c": jnp.ones((1,), dtype=bool),
            "lik_raw": jnp.ones_like(tmpl["lik_raw"], dtype=bool),
            "q_mu": jnp.ones_like(tmpl["q_mu"], dtype=bool),
            "q_sqrt_raw": jnp.tril(jnp.ones((M, M), dtype=bool)),
            "z": jnp.full(tmpl["z"].shape, config.train_inducing,
                          dtype=bool),
        }
        p0 = {k: v for k, v in tmpl.items()}
        p0["kernel_raw"] = raw_i
        # exp-link likelihoods: GLM-style mean init at the data scale
        # (log ȳ) — at real count scales a zero init explodes the first
        # NatGrad step and the NaN rollback freezes the candidate fit
        exp_link = config.likelihood.name in (
            "poisson", "gamma", "exponential", "negative_binomial",
            "zeroinflated_negativebinomial",
        )
        if exp_link:
            mean0 = jnp.log(jnp.maximum(jnp.mean(Y), 1e-6))[None]
            p0["mean_c"] = mean0.astype(dtype)
        # restart randomization, selected by the TRACED flag so one
        # program serves both the deterministic (warm-started) first fit
        # and the random restarts (same pattern as _cand_adam_fns)
        k1, k2, k4 = jax.random.split(key, 3)
        rnd_kraw = jnp.where(
            mask["kernel_raw"],
            jax.random.normal(k1, raw_i.shape, dtype=dtype), raw_i)
        jitter_c = jax.random.normal(k2, (1,), dtype=dtype)
        rnd_mean = p0["mean_c"] + jitter_c if exp_link else jitter_c
        rnd_qs = jnp.diag(jax.random.exponential(k4, (M,), dtype=dtype))
        p0["kernel_raw"] = jnp.where(randomize, rnd_kraw,
                                     p0["kernel_raw"])
        p0["mean_c"] = jnp.where(randomize, rnd_mean, p0["mean_c"])
        p0["q_sqrt_raw"] = jnp.where(randomize, rnd_qs, p0["q_sqrt_raw"])

        # parallel-linesearch L-BFGS (traced per-candidate mask → full-
        # vector mode): flat trial grid instead of the nested zoom
        # while_loops — compiles minutes faster per shape and doesn't pay
        # worst-case trial counts under vmap
        ftol = 1e-9 if dtype == jnp.float64 else 1e-6
        if config.likelihood.name == "gaussian":
            # collapsed (Titsias) bound: optimal-q in closed form, so the
            # optimization vector is ~tens of hyperparameters instead of
            # O(M^2) variational entries. At the optimum this equals the
            # jointly-optimized explicit-q ELBO the reference's scipy path
            # reaches (model_classes.py:299-342); q is materialized after.
            keys_opt = ("kernel_raw", "mean_c", "lik_raw")
            p0_opt = {k: p0[k] for k in keys_opt}
            mask_opt = {k: mask[k] for k in keys_opt}
            # Z == X frozen (M == N, the N<=num_inducing_points case —
            # every bench/real-data search shape): the Titsias bound is
            # tight and svgp.exact_mll computes the same value with ONE
            # gram + ONE Cholesky instead of two grams (Kuu == Kuf
            # recomputed), two Choleskys, and two M^2 N GEMM/solves —
            # the same fast path fit/batch.py:522 already takes. Falls
            # back to the collapsed bound for genuinely sparse M < N.
            obj = (svgp.exact_mll
                   if config.num_inducing >= X.shape[0]
                   else svgp.collapsed_elbo)
            # fused banked gram (kernels/fused.py): only exact_mll takes
            # banks (the M == N, Z == X case — banks key on X alone)
            okw = ({"banks": banks}
                   if (config.fused_layout is not None
                       and config.num_inducing >= X.shape[0]) else {})

            def loss(ps):
                full = dict(p0, **ps)
                return -obj(config, full, X, Y, coded=coded_i, **okw)

            res = plbfgs_fit(loss, p0_opt, mask=mask_opt,
                             max_iter=max_iter, tol=1e-8, ftol=ftol,
                             patience=10)
            full = dict(p0, **res.params)
            # do NOT return (q_mu, q_sqrt): they are closed-form
            # functions of the hyperparameters (optimal_q) and dominate
            # the result pytree — (M, M) per candidate ≈ 64 MB per
            # 64-wide dispatch hauled over the tunneled backend, thrown
            # away for every non-winner. Winners re-materialize via
            # materialize_optimal_q at finalize.
            if split:
                q_mu, q_sqrt = svgp.optimal_q(config, full, X, Y,
                                              coded=coded_i, **okw)
                full_q = dict(full, q_mu=q_mu, q_sqrt_raw=q_sqrt)
            res = res._replace(params={
                k: full[k] for k in ("kernel_raw", "mean_c", "lik_raw",
                                     "z")
            })
        else:
            def loss(p):
                return svgp.training_loss(config, p, X, Y, coded=coded_i)

            # explicit-q (non-Gaussian) candidates: Adam + natural
            # gradients, the reference's optimizer for joint variational
            # fits (model_classes.py:344-470) — line-search L-BFGS
            # variants stall on this objective under a fixed trial grid
            from ..optimize.adam import adam_natgrad_fit

            res = adam_natgrad_fit(
                loss, p0, mask=mask,
                num_opt_iter=max(1000, 2 * max_iter),
                convergence_floor=_CONV_FLOOR,
                loss_guard=needs_loss_guard(config.likelihood.name))
        loglik = -res.loss  # log posterior (no priors → ELBO)
        if split:
            pred_params = (full_q if config.likelihood.name == "gaussian"
                           else res.params)
            hold = jnp.sum(
                svgp.predict_log_density(config, pred_params, Xh, Yh,
                                         coded=coded_i)
            )
        else:
            hold = jnp.zeros((), dtype=dtype)
        n_it = jnp.asarray(getattr(res, "num_iters", 0), dtype=jnp.int32)
        return res.params, loglik, hold, n_it

    def per_candidate(coded_i, raw_i, kmask_i, keys_i, data, y_col,
                      rnd_flags):
        if n_fits == 1:
            return one_fit(coded_i, raw_i, kmask_i, keys_i[0],
                           randomize=rnd_flags[0], data=data, y_col=y_col)
        params, logliks, holds, n_its = jax.vmap(
            lambda k, r: one_fit(coded_i, raw_i, kmask_i, k, randomize=r,
                                 data=data, y_col=y_col)
        )(keys_i, rnd_flags)
        # best restart by max loglik (random_restart_optimize,
        # model_classes.py:511-522), NaN-safe
        ll = jnp.where(jnp.isfinite(logliks), logliks, -jnp.inf)
        best = jnp.argmax(ll)
        return (
            jax.tree.map(lambda a: a[best], params),
            logliks[best],
            holds[best],
            n_its[best],
        )

    return jax.jit(jax.vmap(per_candidate,
                            in_axes=(0, 0, 0, 0, None, 0, None)))


# Non-Gaussian (explicit-q Adam+NatGrad) candidate fits run SEGMENTED:
# ``_SEG_ITERS`` optimizer iterations per device dispatch with the carry
# handed back to the host between segments — the same protocol as the
# penalized driver (fit/batch.py _seg_adam_fns). A single dispatch
# containing the whole >=1000-iteration loop over a 256-wide candidate
# batch runs multiple unbroken minutes on-device; bounded dispatches keep
# the remote TPU responsive, allow all-done early exit between segments,
# and localize device faults to a segment instead of the whole search.
# (Chip evidence: a width-16 NB search runs fine unsegmented; width-256
# crashes the remote worker ~5 min into its single 1000-iteration
# dispatch — the per-dispatch duration, not the program, is the killer.)
import os as _os

_SEG_ITERS = int(_os.environ.get("WAVEOME_SEARCH_SEG_ITERS", "100"))
# Gaussian L-BFGS segments are shorter: candidate fits converge at
# p50~30-38 iterations (chip receipts, docs/BENCHMARKS.md), so 40-iter
# segments let the compaction drop ~half the rows after one segment —
# at 100-iter segments compaction never fired (all fits converge inside
# the first segment and the rest ride the batch max). The bound is
# traced data, so this costs no recompiles; narrower compacted widths
# reuse the existing width-bucket program families.
_GAUSS_SEG_ITERS = int(_os.environ.get("WAVEOME_GAUSS_SEG_ITERS", "40"))

# Absolute convergence floor for search CANDIDATE fits (adam paths):
# candidates are ranked on BIC rounded to 2 decimals inside a beam of
# width 6 (keep_top_k metric_diff), so a fit improving <0.05 per
# 100-iteration check window cannot change any selection — but one such
# straggler strands its whole vmapped sub-batch at the iteration cap.
# Bounded error: with Adam's decaying improvement rate, <=0.05/100 iters
# over the remaining <=900 iterations is <=0.45 BIC, well inside the
# beam. Set WAVEOME_SEARCH_CONV_FLOOR=0 for exact reference-threshold
# behavior.
_CONV_FLOOR = float(_os.environ.get("WAVEOME_SEARCH_CONV_FLOOR", "0.05"))

# between-segment compaction of converged fits (see _seg_loop): widths
# below the dispatch cap that active rows shrink into. Each width is one
# more compiled program per (C, F, likelihood) family — a handful of
# cheap compiles traded against stragglers holding 256 lanes
_COMPACT = _os.environ.get("WAVEOME_SEG_COMPACT", "1") == "1"
_COMPACT_BUCKETS = (4, 16, 64, 128, 192)


@jax.jit
def _tree_scatter(master, carry, idx):
    """Write the live batch rows back into the full-width master."""
    return jax.tree.map(lambda m, c: m.at[idx].set(c), master, carry)


@jax.jit
def _tree_take(tree, sel):
    return jax.tree.map(lambda a: jnp.take(a, sel, axis=0), tree)


@variant_logged
@lru_cache(maxsize=128)
def _cand_adam_fns(config, split: bool, dtype_name: str):
    """Jitted segment steppers for non-Gaussian candidate fits, cached on
    the static configuration (per-call closures would re-trace the whole
    Adam while_loop on every expansion step)."""
    from ..optimize.adam import adam_natgrad_fit

    dtype = jnp.dtype(dtype_name)
    M = config.num_inducing
    exp_link = config.likelihood.name in (
        "poisson", "gamma", "exponential", "negative_binomial",
        "zeroinflated_negativebinomial",
    )
    guard = needs_loss_guard(config.likelihood.name)

    def build(coded_i, raw_i, kmask_i, key, data, y_col, randomize):
        X, Ymat, tmpl, Xh, Yhmat, _banks = data
        Y = jax.lax.dynamic_slice_in_dim(Ymat, y_col, 1, axis=1)
        Yh = jax.lax.dynamic_slice_in_dim(Yhmat, y_col, 1, axis=1)
        mask = {
            "kernel_raw": kmask_i > 0,
            "mean_c": jnp.ones((1,), dtype=bool),
            "lik_raw": jnp.ones_like(tmpl["lik_raw"], dtype=bool),
            "q_mu": jnp.ones_like(tmpl["q_mu"], dtype=bool),
            "q_sqrt_raw": jnp.tril(jnp.ones((M, M), dtype=bool)),
            "z": jnp.full(tmpl["z"].shape, config.train_inducing,
                          dtype=bool),
        }
        p0 = {k: v for k, v in tmpl.items()}
        p0["kernel_raw"] = raw_i
        if exp_link:
            # GLM-style mean init (log ȳ) — see one_fit above
            p0["mean_c"] = jnp.log(
                jnp.maximum(jnp.mean(Y), 1e-6))[None].astype(dtype)
        # restart randomization, selected by the traced flag so one
        # program serves both the deterministic first fit and restarts
        k1, k2, k4 = jax.random.split(key, 3)
        rnd_kraw = jnp.where(
            mask["kernel_raw"],
            jax.random.normal(k1, raw_i.shape, dtype=dtype), raw_i)
        jitter_c = jax.random.normal(k2, (1,), dtype=dtype)
        rnd_mean = p0["mean_c"] + jitter_c if exp_link else jitter_c
        rnd_qs = jnp.diag(jax.random.exponential(k4, (M,), dtype=dtype))
        p0["kernel_raw"] = jnp.where(randomize, rnd_kraw,
                                     p0["kernel_raw"])
        p0["mean_c"] = jnp.where(randomize, rnd_mean, p0["mean_c"])
        p0["q_sqrt_raw"] = jnp.where(randomize, rnd_qs, p0["q_sqrt_raw"])

        def loss(p):
            return svgp.training_loss(config, p, X, Y, coded=coded_i)

        return p0, mask, loss, (Xh, Yh)

    def first_seg(coded_i, raw_i, kmask_i, key, y_col, randomize, bound,
                  data):
        p0, mask, loss, _ = build(coded_i, raw_i, kmask_i, key, data,
                                  y_col, randomize)
        _, carry = adam_natgrad_fit(loss, p0, mask=mask,
                                    num_opt_iter=bound,
                                    convergence_floor=_CONV_FLOOR,
                                    return_carry=True,
                                    loss_guard=guard)
        return carry

    def next_seg(carry, coded_i, raw_i, kmask_i, key, y_col, randomize,
                 bound, data):
        p0, mask, loss, _ = build(coded_i, raw_i, kmask_i, key, data,
                                  y_col, randomize)
        _, carry = adam_natgrad_fit(loss, p0, mask=mask,
                                    num_opt_iter=bound, carry=carry,
                                    convergence_floor=_CONV_FLOOR,
                                    return_carry=True,
                                    loss_guard=guard)
        return carry

    def final_seg(carry, coded_i, raw_i, kmask_i, key, y_col, randomize,
                  data):
        p0, mask, loss, (Xh, Yh) = build(coded_i, raw_i, kmask_i, key,
                                         data, y_col, randomize)
        # bound 0 => no iterations: just the NaN-rollback finalization
        res = adam_natgrad_fit(loss, p0, mask=mask,
                               num_opt_iter=jnp.asarray(0), carry=carry,
                               loss_guard=guard)
        loglik = -res.loss
        if split:
            hold = jnp.sum(
                svgp.predict_log_density(config, res.params, Xh, Yh,
                                         coded=coded_i))
        else:
            hold = jnp.zeros((), dtype=dtype)
        return res.params, loglik, hold

    first_fn = jax.jit(jax.vmap(
        first_seg, in_axes=(0, 0, 0, 0, 0, 0, None, None)))
    next_fn = jax.jit(jax.vmap(
        next_seg, in_axes=(0, 0, 0, 0, 0, 0, 0, None, None)))
    final_fn = jax.jit(jax.vmap(
        final_seg, in_axes=(0, 0, 0, 0, 0, 0, 0, None)))
    return first_fn, next_fn, final_fn


@variant_logged
@lru_cache(maxsize=128)
def _cand_lbfgs_fns(config, split: bool, dtype_name: str,
                    seq_trials: bool = False):
    """Jitted segment steppers for GAUSSIAN (collapsed-bound) candidate
    fits — the L-BFGS analogue of ``_cand_adam_fns``. Each segment
    returns ``(PLBFGSResult, carry)`` (the fit/batch.py run_segments
    protocol) so the host loop can compact converged fits out between
    bounded dispatches: a vmapped while_loop advances every row until
    the LAST row converges, so one straggler made a whole one-shot
    dispatch pay max_iter for all rows."""
    dtype = jnp.dtype(dtype_name)
    # stall-stop knobs (A/B; candidates rank on BIC rounded to 2dp in a
    # width-6 beam, so sub-0.005 loglik gains can't flip a selection)
    ftol = (1e-9 if dtype == jnp.float64
            else float(os.environ.get("WAVEOME_SEARCH_FTOL", "1e-6")))
    patience = int(os.environ.get("WAVEOME_SEARCH_PATIENCE", "10"))

    def build(coded_i, raw_i, kmask_i, key, data, y_col, randomize):
        X, Ymat, tmpl, Xh, Yhmat, banks = data
        Y = jax.lax.dynamic_slice_in_dim(Ymat, y_col, 1, axis=1)
        mask_opt = {
            "kernel_raw": kmask_i > 0,
            "mean_c": jnp.ones((1,), dtype=bool),
            "lik_raw": jnp.ones_like(tmpl["lik_raw"], dtype=bool),
        }
        p0 = {k: v for k, v in tmpl.items()}
        p0["kernel_raw"] = raw_i
        # identical key splits to one_fit (_fit_all_fn) so segmented and
        # one-shot runs start from bit-identical restart draws
        k1, k2, _k4 = jax.random.split(key, 3)
        rnd_kraw = jnp.where(
            mask_opt["kernel_raw"],
            jax.random.normal(k1, raw_i.shape, dtype=dtype), raw_i)
        jitter_c = jax.random.normal(k2, (1,), dtype=dtype)
        p0["kernel_raw"] = jnp.where(randomize, rnd_kraw,
                                     p0["kernel_raw"])
        p0["mean_c"] = jnp.where(randomize, jitter_c, p0["mean_c"])
        p0_opt = {k: p0[k] for k in ("kernel_raw", "mean_c", "lik_raw")}

        # same objective switch as _fit_all_fn: exact MLL when Z == X
        # frozen (M == N) — one gram + one Cholesky per evaluation
        obj = (svgp.exact_mll if config.num_inducing >= X.shape[0]
               else svgp.collapsed_elbo)
        # fused banked gram (kernels/fused.py): only the exact-MLL
        # objective takes banks (Z == X, banks key on X alone)
        okw = ({"banks": banks}
               if (config.fused_layout is not None
                   and config.num_inducing >= X.shape[0]) else {})

        def loss(ps):
            full = dict(p0, **ps)
            return -obj(config, full, X, Y, coded=coded_i, **okw)

        return p0, p0_opt, mask_opt, loss

    def first_seg(coded_i, raw_i, kmask_i, key, y_col, randomize, bound,
                  data):
        _, p0_opt, mask_opt, loss = build(coded_i, raw_i, kmask_i, key,
                                          data, y_col, randomize)
        return plbfgs_fit(loss, p0_opt, mask=mask_opt, max_iter=bound,
                          tol=1e-8, ftol=ftol, patience=patience,
                          trial_sequential=seq_trials,
                          return_carry=True)

    def next_seg(carry, coded_i, raw_i, kmask_i, key, y_col, randomize,
                 bound, data):
        _, p0_opt, mask_opt, loss = build(coded_i, raw_i, kmask_i, key,
                                          data, y_col, randomize)
        return plbfgs_fit(loss, p0_opt, mask=mask_opt, max_iter=bound,
                          tol=1e-8, ftol=ftol, patience=patience,
                          trial_sequential=seq_trials,
                          carry=carry, return_carry=True)

    def hold_one(params_opt, coded_i, y_col, data):
        # split scoring: materialize the closed-form q for THIS
        # candidate's optimum, then holdout log density
        X, Ymat, tmpl, Xh, Yhmat, banks = data
        Y = jax.lax.dynamic_slice_in_dim(Ymat, y_col, 1, axis=1)
        Yh = jax.lax.dynamic_slice_in_dim(Yhmat, y_col, 1, axis=1)
        full = dict(tmpl, **params_opt)
        okw = ({"banks": banks}
               if (config.fused_layout is not None
                   and config.num_inducing >= X.shape[0]) else {})
        q_mu, q_sqrt = svgp.optimal_q(config, full, X, Y, coded=coded_i,
                                      **okw)
        fq = dict(full, q_mu=q_mu, q_sqrt_raw=q_sqrt)
        return jnp.sum(
            svgp.predict_log_density(config, fq, Xh, Yh, coded=coded_i))

    first_fn = jax.jit(jax.vmap(
        first_seg, in_axes=(0, 0, 0, 0, 0, 0, None, None)))
    next_fn = jax.jit(jax.vmap(
        next_seg, in_axes=(0, 0, 0, 0, 0, 0, 0, None, None)))
    hold_fn = (jax.jit(jax.vmap(hold_one, in_axes=(0, 0, 0, None)))
               if split else None)
    return first_fn, next_fn, hold_fn


def _gauss_seg_loop(fns, coded_b, raw_b, kmask_b, keys_b, y_b, randomize,
                    data, total, log, mesh=None):
    """Segment loop for Gaussian candidate batches (compaction between
    bounded L-BFGS dispatches — same protocol as ``_seg_loop``, but the
    steppers return (result, carry) and convergence comes from
    ``result.converged``)."""
    first_fn, next_fn, hold_fn = fns
    seg_iters = _GAUSS_SEG_ITERS
    if mesh is not None:
        from ..parallel import mesh as meshlib

        coded_b, raw_b, kmask_b, keys_b, y_b, randomize = (
            meshlib.shard_leading_axis(
                (coded_b, raw_b, kmask_b, keys_b, y_b, randomize), mesh))
    args = (coded_b, raw_b, kmask_b, keys_b, y_b, randomize)
    bound = min(seg_iters, total)
    res, carry = first_fn(coded_b, raw_b, kmask_b, keys_b, y_b,
                          randomize, jnp.asarray(bound), data)
    width = int(raw_b.shape[0])
    res_full = res
    idx = np.arange(width)  # master row held by each current batch slot
    done = np.zeros(width, dtype=bool)
    cur_args = args
    while bound < total:
        done[idx] = np.asarray(res.converged)
        if log:
            print(f"[gseg] iters<={bound} done {int(done.sum())}/"
                  f"{done.size}", flush=True)
        if done.all():
            break
        act = np.nonzero(~done)[0]
        w = _bucket(act.size, _COMPACT_BUCKETS)
        if mesh is not None:
            w = -(-w // int(mesh.size)) * int(mesh.size)
        # compaction pays only when the remaining-iteration window is
        # long: a narrower batch is one more compiled program per (C, F)
        # family, and Gaussian candidate fits converge in 20-45 L-BFGS
        # iterations (chip receipts in docs/BENCHMARKS.md) — at
        # max_iter=200 with 100-iter segments there is at most ONE
        # segment left to save, which can never repay a fresh compile
        if (_COMPACT and w < len(idx)
                and total - bound > 2 * seg_iters):
            sel = np.concatenate([act, np.repeat(act[:1], w - act.size)])
            # every active master row is in the current batch (done only
            # grows), so gather from the current slots — no master carry
            pos = {r: s for s, r in enumerate(idx)}
            gsel = jnp.asarray([pos[r] for r in sel])
            carry = _tree_take(carry, gsel)
            cur_args = _tree_take(cur_args, gsel)
            if mesh is not None:
                carry = meshlib.shard_leading_axis(carry, mesh)
                cur_args = meshlib.shard_leading_axis(cur_args, mesh)
            idx = sel
        bound = min(bound + seg_iters, total)
        res, carry = next_fn(carry, *cur_args, jnp.asarray(bound), data)
        res_full = _tree_scatter(res_full, res, jnp.asarray(idx))
    loglik = -res_full.loss
    if hold_fn is not None:
        holds = hold_fn(res_full.params, coded_b, y_b, data)
    else:
        holds = jnp.zeros_like(loglik)
    return res_full.params, loglik, holds, res_full.num_iters


def _seg_loop(fns, coded_b, raw_b, kmask_b, keys_b, y_b, randomize,
              data, total, log, mesh=None):
    """Run one flat batch through the bounded-dispatch segment loop.

    Between segments, converged fits are COMPACTED out of the batch:
    the live carry is scattered back into a full-width master, the
    still-active rows gather into the next-smaller width bucket (padded
    with duplicates of the first active row — identical inputs evolve
    identically, so duplicate scatter-back is harmless), and later
    segments run at the smaller width. Chip evidence for why: candidate
    NB batches show 60-85%% of fits converged by iteration 500, but a
    vmapped segment advances ALL rows, so stragglers made every fit pay
    the full iteration cap. Disable with WAVEOME_SEG_COMPACT=0."""
    first_fn, next_fn, final_fn = fns
    if mesh is not None:
        from ..parallel import mesh as meshlib

        coded_b, raw_b, kmask_b, keys_b, y_b, randomize = (
            meshlib.shard_leading_axis(
                (coded_b, raw_b, kmask_b, keys_b, y_b, randomize), mesh))
    args = (coded_b, raw_b, kmask_b, keys_b, y_b, randomize)
    bound = min(_SEG_ITERS, total)
    carry = first_fn(coded_b, raw_b, kmask_b, keys_b, y_b, randomize,
                     jnp.asarray(bound), data)
    width = int(raw_b.shape[0])
    master = None       # full-width carry snapshot (set at 1st compaction)
    idx = np.arange(width)  # master row held by each current batch slot
    cur_args = args
    while bound < total:
        done = np.asarray(carry[5])
        if log:
            print(f"[seg] iters<={bound} done {int(done.sum())}/"
                  f"{done.size}", flush=True)
        if done.all():
            break
        n_act = int((~done).sum())
        w = _bucket(n_act, _COMPACT_BUCKETS)
        if mesh is not None:
            # compacted widths must still divide over the mesh
            w = -(-w // int(mesh.size)) * int(mesh.size)
        if _COMPACT and w < len(idx):
            act = idx[~done]
            sel = np.concatenate([act, np.repeat(act[:1], w - act.size)])
            if master is None:
                master = carry  # pre-compaction carry IS full width
            else:
                master = _tree_scatter(master, carry, jnp.asarray(idx))
            gsel = jnp.asarray(sel)
            carry = _tree_take(master, gsel)
            cur_args = _tree_take(args, gsel)
            if mesh is not None:
                carry = meshlib.shard_leading_axis(carry, mesh)
                cur_args = meshlib.shard_leading_axis(cur_args, mesh)
            idx = sel
        bound = min(bound + _SEG_ITERS, total)
        carry = next_fn(carry, *cur_args, jnp.asarray(bound), data)
    if master is not None:
        carry = _tree_scatter(master, carry, jnp.asarray(idx))
    return final_fn(carry, coded_b, raw_b, kmask_b, keys_b, y_b,
                    randomize, data)


def _fit_candidates_segmented(config, split, n_fits, max_iter, dtype,
                              coded, raw0, kmask, keys, data, y_cols_arr,
                              det_first=False, mesh=None):
    """Host-side segment loop for non-Gaussian candidate batches.

    Restarts are flattened into the batch axis (candidate-major) and the
    best restart per candidate is selected on the host at the end —
    one level of vmap keeps the segment carry a flat batch.

    The flat batch is dispatched in sub-batches of at most
    ``WAVEOME_SEG_WIDTH`` (default 256) fits: a depth-2 expansion over a
    32-outcome chunk flattens to 1000-2000 fits, and one 100-iteration
    segment at that width is a multi-minute device dispatch — long
    enough to kill the tunneled TPU worker (the same per-dispatch-
    duration failure _SEG_ITERS exists for). Capped sub-batches also
    mean every oversized batch reuses ONE compiled cap-wide program
    instead of lowering a fresh program per flattened width.

    Gaussian batches route through the L-BFGS steppers
    (``_cand_lbfgs_fns`` / ``_gauss_seg_loop``) with ``total`` =
    ``max_iter`` (the reference's scipy maxiter semantics); non-Gaussian
    through Adam+NatGrad with the reference's >=1000-iteration budget."""
    import os

    gaussian = config.likelihood.name == "gaussian"
    n_pad = raw0.shape[0]
    if n_fits > 1:
        coded_b = jax.tree.map(
            lambda a: jnp.repeat(a, n_fits, axis=0), coded)
        raw_b = jnp.repeat(raw0, n_fits, axis=0)
        kmask_b = jnp.repeat(kmask, n_fits, axis=0)
        y_b = jnp.repeat(y_cols_arr, n_fits)
        keys_b = keys.reshape(n_pad * n_fits, 2)
        rnd = np.ones((n_pad, n_fits), dtype=bool)
        if det_first:
            # warm-started batches: restart 0 runs from the given init
            # (the parent's optimum) instead of a random draw — the
            # randomize flag is traced data, so this is compile-free
            rnd[:, 0] = False
        randomize = jnp.asarray(rnd.reshape(-1))
    else:
        coded_b, raw_b, kmask_b, y_b = coded, raw0, kmask, y_cols_arr
        keys_b = keys[:, 0, :]
        randomize = jnp.zeros((n_pad,), dtype=bool)

    log = os.environ.get("WAVEOME_SEG_LOG", "0") == "1"
    flat = int(raw_b.shape[0])
    cap = int(os.environ.get("WAVEOME_SEG_WIDTH", "256"))
    if gaussian:
        # the collapsed-bound loss holds (width, N, N)-scale live
        # buffers per line-search trial — a 256-wide f32 batch at N=500
        # OOMs a v5e's HBM (chip receipt, round 4). Cap the gaussian
        # sub-batch lower, and serialize the 4 line-search trials
        # beyond the proven 64-wide footprint (same trade as the
        # penalized driver's large-N guard: identical FLOPs/values,
        # the batch axis already fills the chip)
        cap = min(cap, int(os.environ.get("WAVEOME_GAUSS_SEG_WIDTH",
                                          "128")))
        n_rows = int(data[0].shape[0])
        # trial-vmap budget: the exact-MLL objective (M >= N, the
        # bench/real-data search shape) holds ONE (width, N, N) gram +
        # Cholesky per trial — 4 trials at width 128, N=512 is ~0.5 GB,
        # nowhere near the collapsed bound's blow-up. Batched trials
        # matter on this chip: XLA's factorization kernels are serial
        # per column/panel, so 4x more batch per dispatch amortizes the
        # per-step launch cost that dominates at these small N (the
        # 0.18% MFU headroom). Keep serializing the genuinely sparse
        # collapsed-bound path beyond the proven 64-wide footprint.
        exact_path = config.num_inducing >= n_rows
        budget = int(os.environ.get(
            "WAVEOME_TRIAL_VMAP_BUDGET",
            str((512 * 500 * 500) if exact_path else (64 * 500 * 500))))
        seq_trials = cap * n_rows ** 2 > budget
        fns = _cand_lbfgs_fns(config, bool(split), np.dtype(dtype).name,
                              seq_trials)
        loop = _gauss_seg_loop
        total = max_iter
    else:
        fns = _cand_adam_fns(config, bool(split), np.dtype(dtype).name)
        loop = _seg_loop
        total = max(1000, 2 * max_iter)
    if mesh is not None:
        # sharded sub-batches must divide over the mesh (caller already
        # rounded n_pad; the restart flattening preserves divisibility —
        # flat = n_pad * n_fits — but cap needs its own rounding)
        cap = -(-cap // int(mesh.size)) * int(mesh.size)
    if flat > cap:
        widths = _slice_widths(
            flat, cap, int(mesh.size) if mesh is not None else 1)
        pad_to = sum(widths)
        if pad_to > flat:
            gidx = jnp.asarray(np.concatenate([
                np.arange(flat), np.zeros(pad_to - flat, np.int64)]))
            take = lambda a: jnp.take(a, gidx, axis=0)  # noqa: E731
            coded_b = jax.tree.map(take, coded_b)
            raw_b, kmask_b, keys_b = take(raw_b), take(kmask_b), take(
                keys_b)
            y_b, randomize = take(y_b), take(randomize)
        outs = []
        lo = 0
        for w in widths:
            sl = slice(lo, lo + w)
            out = loop(
                fns, jax.tree.map(lambda a: a[sl], coded_b), raw_b[sl],
                kmask_b[sl], keys_b[sl], y_b[sl], randomize[sl], data,
                total, log, mesh=mesh)
            outs.append(out if len(out) == 4 else (*out, None))
            if log:
                print(f"[seg] sub-batch {lo}-{lo + w}/{pad_to} done",
                      flush=True)
            lo += w
        params = jax.tree.map(
            lambda *xs: jnp.concatenate(xs)[:flat],
            *[o[0] for o in outs])
        logliks = jnp.concatenate([o[1] for o in outs])[:flat]
        holds = jnp.concatenate([o[2] for o in outs])[:flat]
        n_its = (jnp.concatenate([o[3] for o in outs])[:flat]
                 if outs[0][3] is not None else None)
    else:
        out = loop(
            fns, coded_b, raw_b, kmask_b, keys_b, y_b, randomize, data,
            total, log, mesh=mesh)
        params, logliks, holds, n_its = (
            out if len(out) == 4 else (*out, None))
    if n_fits > 1:
        ll = np.asarray(logliks).reshape(n_pad, n_fits)
        ll = np.where(np.isfinite(ll), ll, -np.inf)
        best = np.arange(n_pad) * n_fits + ll.argmax(axis=1)
        params = jax.tree.map(lambda a: a[best], params)
        logliks = jnp.asarray(logliks)[best]
        holds = jnp.asarray(holds)[best]
        if n_its is not None:
            n_its = jnp.asarray(n_its)[best]
    return params, logliks, holds, n_its


@lru_cache(maxsize=64)
def _optimal_q_fn(config):
    def f(params, X, Y, coded):
        return svgp.optimal_q(config, params, X, Y, coded=coded)

    return jax.jit(f)


def materialize_optimal_q(config, params, X, Y, coded) -> dict:
    """Recompute a collapsed-bound (Gaussian) candidate's closed-form
    (q_mu, q_sqrt) from its fitted hyperparameters.

    Gaussian candidate fits return LIGHT params (hyperparameters only):
    q is optimal in closed form (svgp.optimal_q), so returning the
    (M, M) buffers per candidate hauled ~64 MB per 64-wide dispatch over
    the tunneled backend for fits that mostly lose the beam. Winners get
    their q here — one jitted call per finalized model.
    """
    dtype = default_float()
    p = {k: jnp.asarray(v, dtype=dtype) if k != "z" else jnp.asarray(v)
         for k, v in params.items()}
    q_mu, q_sqrt = _optimal_q_fn(config)(
        p, jnp.asarray(X, dtype=p["z"].dtype),
        jnp.asarray(np.asarray(Y).reshape(-1, 1), dtype=p["z"].dtype),
        coded)
    return dict(params, q_mu=np.asarray(q_mu),
                q_sqrt_raw=np.asarray(q_sqrt))


def num_param_groups(spec: KernelSpec, likelihood, train_inducing: bool
                     ) -> int:
    """Count of trainable parameter objects as gpflow's
    len(trainable_parameters) would see them (BIC's k,
    model_search.py:2313-2321)."""
    k = spec.num_trainable_kernel_params()
    k += likelihood.n_params
    k += 1  # constant mean
    k += 2  # q_mu, q_sqrt
    if train_inducing:
        k += 1
    return k


def fit_candidates(
    specs: Sequence[KernelSpec],
    X,
    Y,
    likelihood: str = "gaussian",
    num_restart: int = 5,
    random_seed: Optional[int] = None,
    max_iter: int = 200,
    num_inducing_points: int = 500,
    X_holdout=None,
    Y_holdout=None,
    split: bool = False,
    pad_shape=None,
    y_cols: Optional[Sequence[int]] = None,
    init_raw: Optional[Sequence[Optional[np.ndarray]]] = None,
    mesh=None,
) -> CandidateFit:
    """Fit every candidate spec; return per-candidate best-restart results.

    Scoring (kernel_test, model_search.py:2299-2321): BIC = 2k − 2·loglik
    rounded to 2 decimals, or negative holdout log-density when ``split``.

    Multi-outcome lockstep mode: pass ``Y`` of shape (N, B) plus
    ``y_cols[i]`` = the outcome column candidate i belongs to — candidates
    from EVERY outcome's search fit in one batched program.

    ``mesh``: a 1-D ``jax.sharding.Mesh`` — the candidate batch axis is
    sharded over its devices and the same vmapped programs run SPMD
    (candidate fits are independent, so no collectives are emitted; the
    multi-chip replacement for the reference's 40 Ray search workers,
    model_search.py:1149-1222). Batch paddings and compaction widths are
    rounded to device multiples; ``data`` is replicated.
    """
    dtype = default_float()
    import time as _time

    _prof_lvl = int(os.environ.get("WAVEOME_SEARCH_PROFILE", "0") or 0)
    _prof = _prof_lvl >= 1
    _t0 = _time.perf_counter()
    _marks = [("start", _t0)]

    def _mark(label):
        # phase anatomy at WAVEOME_SEARCH_PROFILE=2: where the
        # fit_candidates wall goes OUTSIDE the fit dispatch itself
        if _prof_lvl >= 2:
            _marks.append((label, _time.perf_counter()))
    # host copies; device arrays must be jit ARGUMENTS, not closure
    # captures (remote-TPU lowering reads back every captured device array)
    X_np = np.asarray(X, dtype=np.float64)
    Y_np = np.asarray(Y, dtype=np.float64)
    if Y_np.ndim == 1:
        Y_np = Y_np[:, None]
    multi = y_cols is not None
    if not multi:
        y_cols = [0] * len(specs)
    N = X_np.shape[0]
    n_cand = len(specs)
    global FIT_COUNT
    FIT_COUNT += n_cand

    n_shards = int(mesh.size) if mesh is not None else 1
    if n_shards > 1:
        from ..parallel import mesh as meshlib

    # pad the candidate list to a bucketed width (slot-0 duplicates,
    # sliced off the results below) so expansion steps of different sizes
    # share one compiled program
    n_pad = _bucket(n_cand, _WIDTH_BUCKETS)
    cap = int(os.environ.get("WAVEOME_SEG_WIDTH", "256"))
    if likelihood == "gaussian":
        # the Gaussian sub-batch cap is tighter (HBM guard in
        # _fit_candidates_segmented) — pad to ITS slice plan, not the
        # generic cap's: a 148-candidate depth-2 expansion was padding
        # 148→256 and dispatching 128+128, the second slice 84% padding
        # (search-prof receipt, round 5); with the right cap it pads to
        # 160 and dispatches 128+32
        cap = min(cap, int(os.environ.get("WAVEOME_GAUSS_SEG_WIDTH",
                                          "128")))
    if n_shards > 1:
        # the sharded batch axis must divide evenly over devices
        cap = -(-cap // n_shards) * n_shards
        n_pad = -(-n_pad // n_shards) * n_shards
    if n_pad > cap:
        # oversized batches dispatch in cap-wide slices plus ONE final
        # smaller bucketed slice (_slice_widths) — pad only to that, not
        # to a full cap multiple: a 179-candidate depth expansion
        # dispatches as 128+64 instead of 2x128, whose trailing slice
        # was 60% padding (search-prof receipt, round 4)
        n_pad = sum(_slice_widths(n_cand, cap, n_shards))
    specs = list(specs) + [specs[0]] * (n_pad - n_cand)
    y_cols = list(y_cols) + [y_cols[0]] * (n_pad - n_cand)
    y_cols_arr = jnp.asarray(np.asarray(y_cols, dtype=np.int32))

    if pad_shape is None:
        C = _bucket(max(s.num_components for s in specs), _C_BUCKETS)
        F = _bucket(max(max(s.max_factors for s in specs), 2), _F_BUCKETS)
    else:
        C, F = pad_shape
    # dedup identical candidate specs: the lockstep multi-outcome search
    # repeats the SAME expansion structures for every outcome (a 16-
    # outcome depth-1 step preps 112 specs but only 7 distinct ones), and
    # the per-spec numpy prep (padded/coded/init/mask python loops) was
    # rivaling the fit dispatch itself — 4.8-9.3 s of a 12-31 s
    # fit_candidates call (search-prof2 receipts, round 5). Prep runs
    # once per UNIQUE (spec, C, F) via an LRU cache; per-candidate rows
    # materialize as one numpy gather + one host→device transfer per
    # leaf.
    row_of = np.empty(n_pad, dtype=np.int64)
    uniq_j = {}
    uniq_specs = []
    for i, s in enumerate(specs):
        j = uniq_j.get(s)
        if j is None:
            j = len(uniq_specs)
            uniq_j[s] = j
            uniq_specs.append(s)
        row_of[i] = j
    preps = [_spec_prep(s, C, F, np.dtype(dtype).name)
             for s in uniq_specs]
    _mark("spec_prep")

    coded_keys = set()
    for coded_u, _r, _m, _o in preps:
        coded_keys.update(coded_u)
    _ord_default = np.ones((C, F), dtype=np.int32)

    def _coded_leaf(p, k):
        return p[0].get(k, _ord_default)

    coded = {
        k: jnp.asarray(
            np.stack([_coded_leaf(p, k) for p in preps])[row_of])
        for k in sorted(coded_keys)
    }

    # static op table: the coded-dispatch switch emits one gram subgraph
    # per branch per factor — restrict it to the ops this search can
    # actually produce (EMPTY always included for padding)
    from ..kernels import ops as _ops

    present = {_ops.EMPTY}
    for _c, _r, _m, ops_set in preps:
        present.update(ops_set)
    ops_table = tuple(sorted(present))

    base_spec = specs[0].padded(C, F)
    config = svgp.make_config(
        base_spec, likelihood, num_data=N, input_dim=X_np.shape[1],
        num_inducing_points=num_inducing_points, coded_structure=True,
        coded_ops=ops_table,
    )

    # fused banked gram (kernels/fused.py): route the Gaussian exact-MLL
    # hot loop's gram assembly through precomputed distance/cat-lin banks
    # + one routing GEMM instead of the per-factor switch dispatch. Only
    # the M == N (Z == X) Gaussian case qualifies — banks key on X alone.
    use_fused = (
        os.environ.get("WAVEOME_FUSED", "1") == "1"
        and config.likelihood.name == "gaussian"
        and config.num_inducing >= N
        and _fused.supported(specs)
    )
    cl_keys = None
    if use_fused:
        # layout from the unique set (identical key/op universe), routing
        # rows gathered back out to the full candidate axis
        layout, cl_keys, routing = _fused.build_layout(
            uniq_specs, X_np.shape[1], C, F)
        coded = dict(coded, **{
            k: jnp.asarray(v[row_of], dtype=dtype)
            if v.dtype.kind == "f" else jnp.asarray(v[row_of])
            for k, v in routing.items()})
        config = dataclasses.replace(config, fused_layout=layout)
    _mark("fused_layout")

    raw_np = np.stack([p[1] for p in preps])[row_of]
    if init_raw is not None:
        # warm starts: per-candidate (C_i, F_i, P) overlays in the
        # candidate's own spec order — padding appends EMPTY rows at the
        # end (KernelSpec.padded), so a leading-block overlay is aligned.
        # Pure argument data: the compiled program is unchanged.
        for i, w in enumerate(init_raw[:n_cand]):
            if w is None:
                continue
            w = np.asarray(w)
            raw_np[i, :w.shape[0], :w.shape[1], :] = w
    raw0 = jnp.asarray(raw_np, dtype=dtype)
    kmask = jnp.asarray(np.stack([p[2] for p in preps])[row_of])

    template = jax.tree.map(np.asarray, svgp.init_params(
        config, jnp.asarray(X_np, dtype=dtype),
        key=jax.random.PRNGKey(random_seed or 0), dtype=dtype,
    ))
    M = config.num_inducing

    seed = random_seed if random_seed is not None else 0
    n_fits = num_restart if num_restart > 1 else 1
    keys = jax.random.split(jax.random.PRNGKey(seed), n_pad * n_fits)
    keys = keys.reshape(n_pad, n_fits, 2)

    if split:
        Xh_np = np.asarray(X_holdout, dtype=np.float64)
        Yh_np = np.asarray(Y_holdout, dtype=np.float64)
        if Yh_np.ndim == 1:
            Yh_np = Yh_np[:, None]

    X_dev = jnp.asarray(X_np, dtype=dtype)
    data = (
        X_dev,
        jnp.asarray(Y_np, dtype=dtype),
        jax.tree.map(lambda a: jnp.asarray(a, dtype=dtype), template),
        jnp.asarray(Xh_np, dtype=dtype) if split else jnp.zeros(
            (1, X_np.shape[1]), dtype=dtype),
        jnp.asarray(Yh_np, dtype=dtype) if split else jnp.zeros(
            (1, 1), dtype=dtype),
        (_fused.build_banks(config.fused_layout, cl_keys, X_dev)
         if use_fused else None),
    )
    if n_shards > 1:
        data = meshlib.replicate(data, mesh)

        def _shard(tree):
            return meshlib.shard_leading_axis(tree, mesh)
    else:
        def _shard(tree):
            return tree

    _mark("stage_data")
    gaussian = config.likelihood.name == "gaussian"
    if gaussian and os.environ.get("WAVEOME_GAUSS_SEG", "1") != "1":
        # one-shot vmapped path (WAVEOME_GAUSS_SEG=0): the whole
        # max_iter L-BFGS in a single dispatch — kept as the
        # equivalence oracle for the segmented default
        fit_all = _fit_all_fn(config, bool(split), n_fits, max_iter,
                              np.dtype(dtype).name)
        # restart-randomization flags (traced data, shared across the
        # candidate axis): single fits and warm-started batches run
        # restart 0 from the given init instead of a random draw
        rnd = np.ones((n_fits,), dtype=bool)
        if n_fits == 1 or init_raw is not None:
            rnd[0] = False
        rnd = jnp.asarray(rnd)
        if n_pad > cap:
            # cap-wide dispatch slices: bounds per-dispatch duration
            # (tunneled-worker killer) and reuses one compiled program
            outs = []
            for lo in range(0, n_pad, cap):
                c_s, r_s, k_s, key_s, y_s = _shard((
                    jax.tree.map(lambda a: a[lo:lo + cap], coded),
                    raw0[lo:lo + cap], kmask[lo:lo + cap],
                    keys[lo:lo + cap], y_cols_arr[lo:lo + cap]))
                outs.append(fit_all(c_s, r_s, k_s, key_s, data, y_s,
                                    rnd))
            params = jax.tree.map(lambda *xs: jnp.concatenate(xs),
                                  *[o[0] for o in outs])
            logliks = jnp.concatenate([o[1] for o in outs])
            holds = jnp.concatenate([o[2] for o in outs])
            n_its = jnp.concatenate([o[3] for o in outs])
        else:
            coded, raw0, kmask, keys, y_cols_arr = _shard(
                (coded, raw0, kmask, keys, y_cols_arr))
            params, logliks, holds, n_its = fit_all(
                coded, raw0, kmask, keys, data, y_cols_arr, rnd)
    else:
        params, logliks, holds, n_its = _fit_candidates_segmented(
            config, split, n_fits, max_iter, dtype, coded, raw0, kmask,
            keys, data, y_cols_arr, det_first=init_raw is not None,
            mesh=mesh if n_shards > 1 else None)
        if gaussian:
            # segmented Gaussian results carry only the optimized
            # hyperparameters; z is shared (untrained inducing inputs)
            params = dict(params, z=jnp.broadcast_to(
                data[2]["z"], (n_pad,) + data[2]["z"].shape))

    _mark("dispatch")
    if _prof:
        # per-dispatch profile line (WAVEOME_SEARCH_PROFILE=1): where a
        # search's wall clock goes — padding waste is n_pad/n_cand,
        # restart multiplier n_fits, program family is (C, F, likelihood),
        # and the iters spread quantifies lockstep straggling (every row
        # of a vmapped while_loop pays the max row's iterations)
        jax.block_until_ready(logliks)
        _el = _time.perf_counter() - _t0
        _istr = ""
        if n_its is not None:
            _ia = np.asarray(n_its)[:n_cand]
            _istr = (f" iters_p50={int(np.percentile(_ia, 50))} "
                     f"p90={int(np.percentile(_ia, 90))} "
                     f"max={int(_ia.max())}")
        print(f"[search-prof] lik={config.likelihood.name} n_cand={n_cand} "
              f"n_pad={n_pad} C={C} F={F} restarts={n_fits} "
              f"split={bool(split)} elapsed={_el:.2f}s "
              f"fits_per_min={n_cand * n_fits / (_el / 60):.0f}{_istr}",
              flush=True)

    # drop bucket-padding duplicates; materialize params on the HOST in
    # one bulk pytree transfer — callers store per-candidate slices, and
    # per-candidate np.asarray(leaf[i]) was hundreds of small
    # device->host round trips (~18 s of a 37 s warm depth-2 search over
    # the tunneled backend; WAVEOME_SEARCH_PROFILE receipts)
    params = jax.device_get(jax.tree.map(lambda a: a[:n_cand], params))
    logliks = np.asarray(logliks)[:n_cand]
    holds = np.asarray(holds)[:n_cand]
    specs = specs[:n_cand]
    _mark("fetch")
    if _prof_lvl >= 2:
        parts = " ".join(
            f"{lab}={(t1 - t0) * 1e3:.0f}ms" for (_l0, t0), (lab, t1)
            in zip(_marks, _marks[1:]))
        print(f"[search-prof2] {parts}", flush=True)

    bics = np.empty(n_cand)
    lik = config.likelihood
    for i, s in enumerate(specs):
        if split:
            bics[i] = round(-float(holds[i]), 2)
        else:
            k = num_param_groups(s, lik, config.train_inducing)
            bics[i] = round(2.0 * k - 2.0 * float(logliks[i]), 2)

    return CandidateFit(
        params=params, loglik=logliks, holdout=holds if split else None,
        bic=bics,
        iters=np.asarray(n_its)[:n_cand] if n_its is not None else None,
    ), config
