"""Adam (+ natural-gradient) optimization loop with the reference's
checkpoint / rollback / decay / convergence semantics.

Mirrors ``BaseGP.optimize_params``'s adam branch (model_classes.py:344-470):

  * Adam on all trainable params except (q_mu, q_sqrt);
  * natural-gradient step on (q_mu, q_sqrt) each iteration;
  * learning-rate decay ``lr·decay^(i/500)`` refreshed every 500 iters;
  * parameter snapshot every 100 iters with rollback on NaN loss;
  * early stop when the 100-iter loss improvement falls below
    ``convergence_threshold``.

Implemented as one ``lax.while_loop`` so the whole fit jits and vmaps.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

from .natgrad import natgrad_step


class AdamResult(NamedTuple):
    params: dict
    loss: jnp.ndarray
    num_iters: jnp.ndarray
    converged: jnp.ndarray


def adam_natgrad_fit(
    loss_fn: Callable,
    params0: dict,
    mask=None,
    learning_rate: float = 0.1,
    decay_rate: float = 0.96,
    nat_gradient_gamma: float = 0.1,
    num_opt_iter: int = 5000,
    convergence_threshold: float = 1e-9,
    use_natgrad: bool = True,
    check_every: int = 100,
    carry=None,
    return_carry: bool = False,
) -> AdamResult:
    """Optimize ``params0`` (a dict pytree with 'q_mu'/'q_sqrt_raw' entries).

    ``mask`` freezes entries as in lbfgs_fit. When ``use_natgrad`` is True,
    (q_mu, q_sqrt_raw) are excluded from Adam and updated by the
    natural-gradient rule (model_classes.py:351-364).

    Segmented execution: ``num_opt_iter`` may be traced; pass the state
    returned under ``return_carry=True`` back as ``carry`` with a larger
    bound to resume (the batch driver's bounded-duration device calls).
    """
    var_keys = ("q_mu", "q_sqrt_raw") if use_natgrad else ()

    if mask is None:
        mask = jax.tree.map(lambda a: jnp.ones_like(a, dtype=bool), params0)
    adam_mask = dict(mask)
    for k in var_keys:
        if k in adam_mask:
            adam_mask[k] = jnp.zeros_like(adam_mask[k])

    flat_mask, _ = ravel_pytree(adam_mask)

    sched = optax.exponential_decay(
        init_value=learning_rate,
        transition_steps=500,
        decay_rate=decay_rate,
        staircase=True,
    )
    opt = optax.adam(learning_rate=sched)

    flat0, unravel = ravel_pytree(params0)

    def f(flat):
        return loss_fn(unravel(flat))

    grad_fn = jax.value_and_grad(f)

    def natgrad_apply(flat):
        if not var_keys:
            return flat
        params = unravel(flat)
        _, g = grad_fn(flat)
        gp = unravel(g)
        q_mu_new, q_sqrt_new = natgrad_step(
            gp["q_mu"], gp["q_sqrt_raw"], params["q_mu"],
            jnp.tril(params["q_sqrt_raw"]), nat_gradient_gamma,
        )
        params = dict(params)
        params["q_mu"] = q_mu_new
        params["q_sqrt_raw"] = q_sqrt_new
        out, _ = ravel_pytree(params)
        return out

    def body(carry):
        flat, opt_state, snapshot, last_loss, it, done = carry
        # adam step on non-variational params
        value, grad = grad_fn(flat)
        grad = jnp.where(flat_mask, grad, 0.0)
        updates, opt_state = opt.update(grad, opt_state, flat)
        updates = jnp.where(flat_mask, updates, 0.0)
        flat = flat + updates
        # natural gradient on (q_mu, q_sqrt)
        if var_keys:
            flat = natgrad_apply(flat)

        def checkpoint(args):
            flat, snapshot, last_loss, done = args
            cur = f(flat)
            bad = ~jnp.isfinite(cur)
            # rollback on NaN (model_classes.py:425-429)
            flat = jnp.where(bad, snapshot, flat)
            # f32 only: scale-relative threshold — at |loss| ~ 1e9 (real
            # count data) an absolute 1e-9 test is satisfied by ULP
            # quantization alone and freezes the fit after one check.
            # f64 keeps the reference's absolute threshold
            # (model_classes.py:434-447 semantics).
            if flat0.dtype == jnp.float32:
                thresh = convergence_threshold * jnp.maximum(
                    1.0, jnp.abs(cur))
            else:
                thresh = convergence_threshold
            converged = (last_loss - cur) < thresh
            done = bad | converged
            return flat, jnp.where(bad, snapshot, flat), cur, done

        flat, snapshot, last_loss, done = jax.lax.cond(
            (it + 1) % check_every == 0,
            checkpoint,
            lambda a: a,
            (flat, snapshot, last_loss, done),
        )
        return flat, opt_state, snapshot, last_loss, it + 1, done

    def cond(carry):
        *_, it, done = carry
        return (it < num_opt_iter) & ~done

    if carry is None:
        init = (
            flat0,
            opt.init(flat0),
            flat0,
            jnp.asarray(jnp.inf, dtype=flat0.dtype),
            jnp.asarray(0),
            jnp.asarray(False),
        )
    else:
        init = carry
    carry_fin = jax.lax.while_loop(cond, body, init)
    flat_fin, _, snapshot, _, it, done = carry_fin
    final_loss = f(flat_fin)
    bad = ~jnp.isfinite(final_loss)
    flat_out = jnp.where(bad, snapshot, flat_fin)
    result = AdamResult(unravel(flat_out), f(flat_out), it, done & ~bad)
    if return_carry:
        return result, carry_fin
    return result
