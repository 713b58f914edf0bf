"""Vmappable L-BFGS fitter.

Replaces the reference's SciPy L-BFGS-B path — the default optimizer for
models with ≤5000 trainable parameters (``model_classes.py:299-342``, 5
retry attempts around ``gpflow.optimizers.Scipy().minimize``) — with a pure
JAX loop built on optax's L-BFGS + zoom line search. Because the whole fit
is one jitted ``lax.while_loop``, it vmaps across outcomes / folds / search
candidates and shards over a TPU mesh: the property that turns the
reference's one-process-per-model Ray farm into a single batched XLA
program (SURVEY.md §2.8).

Frozen parameters (the reference's ``set_trainable(…, False)``) are handled
by masking: the optimization variable is only consulted where ``mask`` is
True, so frozen entries carry exactly zero gradient and never perturb the
curvature pairs.

NaN robustness mirrors the reference's retry/rollback semantics
(model_classes.py:323-341): if the final loss is non-finite, the initial
parameters are returned.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree


class LBFGSResult(NamedTuple):
    params: dict
    loss: jnp.ndarray
    num_iters: jnp.ndarray
    converged: jnp.ndarray


class LBFGSCarry(NamedTuple):
    """Resumable optimizer state for segmented execution: run the loop in
    bounded-duration segments (remote-TPU transports can kill long single
    executions), carrying (x, optax state) across jit calls."""

    x: jnp.ndarray
    state: tuple


def lbfgs_fit(
    loss_fn: Callable,
    params0,
    mask=None,
    max_iter: int = 500,
    tol: float = 1e-8,
    history: int = 10,
    max_linesearch_steps: int = 20,
    carry: Optional[LBFGSCarry] = None,
    return_carry: bool = False,
    linesearch: str = "zoom",
) -> LBFGSResult:
    """Minimize ``loss_fn(params)`` over the pytree ``params0``.

    ``mask``: boolean pytree (same structure) — False entries are frozen.
    Returns the optimized pytree, final loss, iterations and a convergence
    flag. Jit/vmap-safe.

    Segmented execution: pass ``carry`` from a previous call and a larger
    ``max_iter`` (the bound is the cumulative iteration count tracked in
    the optax state, so it may be a traced value); with
    ``return_carry=True`` the result tuple is ``(LBFGSResult, LBFGSCarry)``.
    """
    import numpy as _np

    flat0, unravel = ravel_pytree(params0)

    # Static (numpy) masks enable SUBSET optimization: the optimization
    # vector contains only the free entries, so the L-BFGS history costs
    # O(memory × n_free) instead of O(memory × n_total). With frozen
    # variational parameters (the collapsed Gaussian path) that is ~10
    # floats instead of ~250k — the difference between fitting thousands
    # of outcomes per chip and OOMing HBM.
    static_subset = mask is not None and all(
        isinstance(leaf, _np.ndarray)
        for leaf in jax.tree.leaves(mask)
    )

    if mask is None:
        mask_flat = jnp.ones_like(flat0, dtype=bool)
        free_idx = None
    elif static_subset:
        mask_np = _np.concatenate([
            _np.asarray(leaf).reshape(-1)
            for leaf in jax.tree.leaves(mask)
        ])
        # verify alignment with ravel_pytree ordering
        assert mask_np.shape[0] == flat0.shape[0], (
            "static mask/params size mismatch"
        )
        free_idx = jnp.asarray(_np.nonzero(mask_np)[0])
        mask_flat = None
    else:
        mask_flat, _ = ravel_pytree(mask)
        free_idx = None

    # Non-finite trial values (e.g. a full −∇ first step blowing up the
    # Cholesky) are mapped to a huge finite penalty so the zoom line search
    # backtracks instead of accepting a NaN point — the JAX-native analogue
    # of the reference's catch-and-retry around scipy L-BFGS-B
    # (model_classes.py:323-341).
    big = jnp.asarray(1e15, dtype=flat0.dtype)

    if free_idx is not None:
        def f(x):
            merged = flat0.at[free_idx].set(x)
            v = loss_fn(unravel(merged))
            return jnp.where(jnp.isfinite(v), v, big)
    else:
        def f(x):
            merged = jnp.where(mask_flat, x, flat0)
            v = loss_fn(unravel(merged))
            return jnp.where(jnp.isfinite(v), v, big)

    if linesearch == "backtracking":
        # value-only Armijo backtracking: ~1 gradient + k value evals per
        # iteration vs zoom's value+grad per trial — much cheaper when the
        # strong-Wolfe curvature condition is hard to satisfy (f32)
        ls = optax.scale_by_backtracking_linesearch(
            max_backtracking_steps=max_linesearch_steps, store_grad=True,
        )
    else:
        ls = optax.scale_by_zoom_linesearch(
            max_linesearch_steps=max_linesearch_steps,
            initial_guess_strategy="one",
        )
    opt = optax.lbfgs(memory_size=history, linesearch=ls)
    value_and_grad = optax.value_and_grad_from_state(f)

    def step(carry):
        x, state = carry
        value, grad = value_and_grad(x, state=state)
        updates, state = opt.update(
            grad, state, x, value=value, grad=grad, value_fn=f
        )
        x = optax.apply_updates(x, updates)
        return x, state

    def cond(carry):
        _, state = carry
        it = optax.tree_utils.tree_get(state, "count")
        grad = optax.tree_utils.tree_get(state, "grad")
        value = optax.tree_utils.tree_get(state, "value")
        err = optax.tree_utils.tree_norm(grad)
        return (it == 0) | (
            (it < max_iter) & (err >= tol) & jnp.isfinite(value)
        )

    x0 = flat0[free_idx] if free_idx is not None else flat0
    if carry is None:
        x_init, state0 = x0, opt.init(x0)
    else:
        x_init, state0 = carry.x, carry.state
    x_fin, state_fin = jax.lax.while_loop(cond, step, (x_init, state0))
    final_loss = f(x_fin)
    it = optax.tree_utils.tree_get(state_fin, "count")
    grad = optax.tree_utils.tree_get(state_fin, "grad")
    converged = optax.tree_utils.tree_norm(grad) < tol

    # NaN rollback (model_classes.py:323-341 retry semantics); a final
    # value at the big-guard plateau counts as failed too
    bad = ~jnp.isfinite(final_loss) | (final_loss >= big)
    if free_idx is not None:
        x_merged = flat0.at[free_idx].set(x_fin)
        x_out = jnp.where(bad, flat0, x_merged)
    else:
        x_out = jnp.where(bad, flat0, jnp.where(mask_flat, x_fin, flat0))
    loss_out = jnp.where(bad, f(x0), final_loss)
    result = LBFGSResult(unravel(x_out), loss_out, it, converged & ~bad)
    if return_carry:
        return result, LBFGSCarry(x=x_fin, state=state_fin)
    return result
