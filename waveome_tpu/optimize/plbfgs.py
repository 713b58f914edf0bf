"""L-BFGS with a PARALLEL fixed-grid line search (TPU-native).

Sequential line searches are poison under vmap: the internal while-loop
runs until the slowest batch member finishes, so a 256-outcome batch pays
the worst-case trial count every iteration even though the median is 1-3.
Here the line search evaluates a fixed geometric grid of trial steps in
ONE batched call (vmap over trials — data-parallel on the VPU/MXU, no
sequential dependency) and selects the best Armijo-satisfying step.

Per iteration: exactly one batched trial evaluation + one gradient
evaluation — constant sequential depth, independent of line-search
difficulty. Curvature pairs are skipped when sᵀy ≤ 0 (standard damping),
so superlinear convergence is preserved where the Wolfe condition would
have held.

Designed for the subset-optimization regime (static numpy mask → the
optimization vector is the ~10 free hyperparameters), where the trial-grid
evaluation cost is pure model evaluations.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree


class PLBFGSState(NamedTuple):
    x: jnp.ndarray
    f_val: jnp.ndarray
    g: jnp.ndarray
    s_hist: jnp.ndarray  # (m, d)
    y_hist: jnp.ndarray  # (m, d)
    rho: jnp.ndarray  # (m,)
    count: jnp.ndarray
    stepsize: jnp.ndarray
    n_pairs: jnp.ndarray
    stall: jnp.ndarray  # iterations since a relative improvement > ftol


class PLBFGSResult(NamedTuple):
    params: dict
    loss: jnp.ndarray
    num_iters: jnp.ndarray
    converged: jnp.ndarray


# geometric trial grid relative to the previous accepted step. Every trial
# is one batched objective evaluation across the whole vmapped batch, so
# the grid size multiplies the dominant per-iteration cost; measured on
# the bench workload, 4 trials beats 6 (1012 vs 843 fits/min) at equal
# final losses (slightly better, total 35205.7 vs 35227.4) — the extra
# iterations (p50 41 vs 33) cost less than the wider grid.
# WAVEOME_LS_TRIALS overrides the grid size for A/B runs (3 keeps the
# [2.0, 1.0, 0.4] prefix; 2 keeps [2.0, 1.0]); per-iteration cost is
# (trials + ~2 grad) forward-equivalents, so 4->3 shaves ~17% FLOPs if
# the iteration count holds. NOTE: changing it changes every compiled
# program shape (the grid is baked into the trace) — recompiles.
# Measured (round 4, chip, search bench @ 16 outcomes depth 2): 3 trials
# LOSES cold — 150 vs 262 fits/min (dropping the 0.08 step makes fits
# from randomized inits shrink the stepsize over extra iterations) and
# only ties warm-started (276 vs 269). The 4-trial default stands.
_TRIALS_FULL = np.asarray([2.0, 1.0, 0.4, 0.08], dtype=np.float64)


def _trial_grid():
    import os

    n = int(os.environ.get("WAVEOME_LS_TRIALS", "4"))
    return _TRIALS_FULL[: max(2, min(n, len(_TRIALS_FULL)))]


_TRIALS = _trial_grid()


def _two_loop(g, s_hist, y_hist, rho, n_pairs, count):
    """Standard L-BFGS two-loop recursion over a circular history."""
    m = s_hist.shape[0]

    def bwd(i, carry):
        q, alphas = carry
        idx = (count - 1 - i) % m
        valid = i < n_pairs
        alpha = rho[idx] * (s_hist[idx] @ q)
        alpha = jnp.where(valid, alpha, 0.0)
        q = q - alpha * y_hist[idx] * valid
        return q, alphas.at[idx].set(alpha)

    q, alphas = jax.lax.fori_loop(
        0, m, bwd, (g, jnp.zeros(m, dtype=g.dtype))
    )

    # initial scaling γ = sᵀy / yᵀy of the newest pair
    newest = (count - 1) % m
    have = n_pairs > 0
    gamma = jnp.where(
        have,
        (s_hist[newest] @ y_hist[newest])
        / jnp.maximum(y_hist[newest] @ y_hist[newest], 1e-30),
        1.0,
    )
    r = gamma * q

    def fwd(i, r):
        idx = (count - n_pairs + i) % m
        valid = i < n_pairs
        beta = rho[idx] * (y_hist[idx] @ r)
        r = r + (alphas[idx] - beta) * s_hist[idx] * valid
        return r

    r = jax.lax.fori_loop(0, m, fwd, r)
    return -r


def plbfgs_fit(
    loss_fn: Callable,
    params0,
    mask,
    max_iter,
    tol: float = 3e-5,
    history: int = 10,
    carry: Optional[PLBFGSState] = None,
    return_carry: bool = False,
    armijo_c1: float = 1e-4,
    ftol: float = 1e-6,
    patience: int = 8,
    min_iter: int = 0,
    trial_loss_fn: Optional[Callable] = None,
    trial_sequential: bool = False,
):
    """Minimize ``loss_fn(params)`` over the masked free subset.

    ``trial_sequential``: evaluate the line-search trial grid with
    ``lax.map`` instead of ``vmap``. Same trial values and FLOPs, but the
    grid stops multiplying the objective's live memory by the trial
    count — at N=4096 the vmapped trials materialize a
    (outcomes, trials, N²) gram buffer that exceeds a v5e HBM (34 GB at
    B=32), while sequential trials fit. The outcome batch axis already
    saturates the chip, so serializing the 4 trials costs little
    wall-clock at large N. Callers flip this above a size threshold
    (fit/batch.py).

    ``mask``: a numpy pytree (STATIC) enables subset optimization — the
    optimization vector holds only the free entries (L-BFGS history
    O(m·n_free)). A traced/jnp mask falls back to full-vector mode with
    frozen entries pinned via ``where`` (zero gradient, zero curvature
    contribution) — needed when the mask differs per vmapped batch member
    (the search engine's per-candidate structures). ``max_iter`` may be
    traced (segmented execution: pass the returned state back as
    ``carry``).

    Convergence: gradient norm < ``tol`` (scipy gtol semantics), or no
    relative objective improvement > ``ftol`` for ``patience`` consecutive
    iterations (scipy ftol semantics — in float32 the gradient tolerance
    is often unreachable while the objective has long plateaued, which
    would make every batch member ride to max_iter).
    """
    flat0, unravel = ravel_pytree(params0)
    static_subset = all(
        isinstance(leaf, np.ndarray) for leaf in jax.tree.leaves(mask)
    )
    dtype = flat0.dtype
    big = jnp.asarray(1e15, dtype=dtype)

    # ``trial_loss_fn``: optional cheaper/fused evaluation used ONLY for
    # the (never-differentiated) line-search trial values — e.g. the
    # forward-only Pallas gram objective; the gradient always evaluates
    # ``loss_fn``
    tfn = trial_loss_fn if trial_loss_fn is not None else loss_fn

    if static_subset:
        mask_np = np.concatenate([
            np.asarray(leaf).reshape(-1) for leaf in jax.tree.leaves(mask)
        ])
        assert mask_np.shape[0] == flat0.shape[0]
        free_idx = jnp.asarray(np.nonzero(mask_np)[0])
        d = int(mask_np.sum())

        def make_f(inner):
            def f(xfree):
                merged = flat0.at[free_idx].set(xfree)
                v = inner(unravel(merged))
                return jnp.where(jnp.isfinite(v), v, big)
            return f
    else:
        mask_flat, _ = ravel_pytree(mask)
        free_idx = None
        d = flat0.shape[0]

        def make_f(inner):
            def f(x):
                merged = jnp.where(mask_flat, x, flat0)
                v = inner(unravel(merged))
                return jnp.where(jnp.isfinite(v), v, big)
            return f

    f = make_f(loss_fn)
    f_trial = make_f(tfn) if trial_loss_fn is not None else f
    grad_f = jax.grad(f)
    trials = jnp.asarray(_TRIALS, dtype=dtype)

    def step(state: PLBFGSState) -> PLBFGSState:
        direction = _two_loop(state.g, state.s_hist, state.y_hist,
                              state.rho, state.n_pairs, state.count)
        # keep the first step conservative if the gradient is huge
        dir_norm = jnp.linalg.norm(direction)
        direction = direction * jnp.minimum(
            1.0, 1e3 / jnp.maximum(dir_norm, 1e-30)
        )
        slope = state.g @ direction

        steps = state.stepsize * trials
        trial_f = lambda t: f_trial(state.x + t * direction)  # noqa: E731
        if trial_sequential:
            fs = jax.lax.map(trial_f, steps)
        else:
            fs = jax.vmap(trial_f)(steps)
        armijo = fs <= state.f_val + armijo_c1 * steps * slope
        any_ok = jnp.any(armijo)
        fs_sel = jnp.where(any_ok, jnp.where(armijo, fs, big), fs)
        j = jnp.argmin(fs_sel)
        t, f_new = steps[j], fs[j]

        improved = f_new < state.f_val
        t = jnp.where(improved, t, 0.0)
        f_new = jnp.where(improved, f_new, state.f_val)
        x_new = state.x + t * direction
        g_new = jax.lax.cond(improved,
                             lambda x: grad_f(x),
                             lambda x: state.g, x_new)

        s = x_new - state.x
        y = g_new - state.g
        sy = s @ y
        good_pair = improved & (sy > 1e-12)
        slot = state.count % history
        s_hist = jnp.where(good_pair,
                           state.s_hist.at[slot].set(s), state.s_hist)
        y_hist = jnp.where(good_pair,
                           state.y_hist.at[slot].set(y), state.y_hist)
        rho = jnp.where(
            good_pair,
            state.rho.at[slot].set(1.0 / jnp.maximum(sy, 1e-30)),
            state.rho,
        )
        n_pairs = jnp.where(good_pair,
                            jnp.minimum(state.n_pairs + 1, history),
                            state.n_pairs)
        count_pairs = jnp.where(good_pair, state.count + 1, state.count)

        # next base stepsize: the accepted step (shrink hard on failure)
        new_step = jnp.where(improved, jnp.maximum(t, 1e-8),
                             state.stepsize * 0.1)
        new_step = jnp.clip(new_step, 1e-8, 1e4)

        rel_improve = (state.f_val - f_new) / jnp.maximum(
            jnp.abs(state.f_val), 1.0
        )
        stall = jnp.where(rel_improve > ftol, 0, state.stall + 1)

        return PLBFGSState(
            x=x_new, f_val=f_new, g=g_new,
            s_hist=s_hist, y_hist=y_hist, rho=rho,
            count=count_pairs, stepsize=new_step,
            n_pairs=n_pairs, stall=stall,
        )

    def cond(carry_):
        state, it = carry_
        gnorm = jnp.linalg.norm(state.g)
        # the stall stop is suppressed before min_iter: early line-search
        # stepsize adaptation can plateau transiently (joint variational
        # optimization), which must not count as convergence
        stalled = (state.stall >= patience) & (it >= min_iter)
        return (it < max_iter) & (gnorm >= tol) & ~stalled

    def body(carry_):
        state, it = carry_
        return step(state), it + 1

    if carry is None:
        x0 = flat0[free_idx] if free_idx is not None else flat0
        f0 = f(x0)
        g0 = grad_f(x0)
        state0 = PLBFGSState(
            x=x0, f_val=f0, g=g0,
            s_hist=jnp.zeros((history, d), dtype=dtype),
            y_hist=jnp.zeros((history, d), dtype=dtype),
            rho=jnp.zeros((history,), dtype=dtype),
            count=jnp.asarray(0),
            stepsize=jnp.asarray(1.0, dtype=dtype),
            n_pairs=jnp.asarray(0),
            stall=jnp.asarray(0),
        )
        it0 = jnp.asarray(0)
    else:
        state0, it0 = carry

    state_fin, it_fin = jax.lax.while_loop(cond, body, (state0, it0))

    bad = ~jnp.isfinite(state_fin.f_val) | (state_fin.f_val >= big)
    if free_idx is not None:
        x_merged = flat0.at[free_idx].set(state_fin.x)
    else:
        x_merged = jnp.where(mask_flat, state_fin.x, flat0)
    x_out = jnp.where(bad, flat0, x_merged)
    converged = (
        (jnp.linalg.norm(state_fin.g) < tol)
        | (state_fin.stall >= patience)
    ) & ~bad
    result = PLBFGSResult(
        params=unravel(x_out),
        loss=jnp.where(
            bad,
            f(flat0[free_idx] if free_idx is not None else flat0),
            state_fin.f_val,
        ),
        num_iters=it_fin,
        converged=converged,
    )
    if return_carry:
        return result, (state_fin, it_fin)
    return result
