"""Minibatched ELBO training (large-N non-Gaussian fits).

Re-provides the reference's minibatch branch (model_classes.py:384-393:
``tf.data`` shuffle/repeat/batch with the ELBO data term rescaled by
N/batch_size) as one jittable ``lax.while_loop``: each step draws a
without-replacement minibatch with ``jax.random.choice`` (per-step
reshuffle — the stateless analogue of the tf.data shuffled epoch stream),
takes an Adam step on the hyperparameters and a natural-gradient step on
(q_mu, q_sqrt), and every ``check_every`` steps evaluates the FULL
objective for the reference's convergence / NaN-rollback checks
(model_classes.py:398-470).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

from .natgrad import natgrad_step


class MinibatchResult(NamedTuple):
    params: dict
    loss: jnp.ndarray  # FULL-data objective at the final params
    num_iters: jnp.ndarray


def minibatch_fit(
    batch_loss_fn: Callable,  # (params, idx) -> scaled objective
    full_loss_fn: Callable,  # (params,) -> full objective
    params0: dict,
    num_data: int,
    batch_size: int,
    key: jax.Array,
    mask=None,
    learning_rate: float = 0.05,
    decay_rate: float = 0.96,
    nat_gradient_gamma: float = 0.1,
    num_opt_iter: int = 2000,
    convergence_threshold: float = 1e-6,
    use_natgrad: bool = True,
    check_every: int = 100,
    loss_guard: bool = False,
) -> MinibatchResult:
    """SGD loop over minibatch indices; see module docstring.

    ``batch_loss_fn`` receives the (batch_size,) index vector and must
    apply the N/batch scale itself (svgp.elbo's ``scale`` argument).
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
        init_value=learning_rate, transition_steps=500,
        decay_rate=decay_rate, staircase=True,
    )
    opt = optax.adam(learning_rate=sched)
    flat0, unravel = ravel_pytree(params0)

    def f_batch(flat, idx):
        return batch_loss_fn(unravel(flat), idx)

    def f_full(flat):
        return full_loss_fn(unravel(flat))

    grad_fn = jax.value_and_grad(f_batch)

    def body(carry):
        flat, opt_state, snapshot, last_loss, it, done, k = carry
        k, k_idx = jax.random.split(k)
        idx = jax.random.choice(k_idx, num_data, (batch_size,),
                                replace=False)
        value, grad = grad_fn(flat, idx)
        grad = jnp.where(flat_mask, grad, 0.0)
        updates, opt_state = opt.update(grad, opt_state, flat)
        updates = jnp.where(flat_mask, updates, 0.0)
        flat = flat + updates
        if var_keys:
            params = unravel(flat)
            _, g = grad_fn(flat, idx)
            gp = unravel(g)
            Lq = jnp.tril(params["q_sqrt_raw"])
            q_mu_new, q_sqrt_new = natgrad_step(
                gp["q_mu"], gp["q_sqrt_raw"], params["q_mu"], Lq,
                nat_gradient_gamma,
            )
            if loss_guard:
                # loss-guarded variational update on THIS minibatch
                # (same failure mode as optimize/adam.py natgrad_apply:
                # unbounded-Fisher exp-link likelihoods at real count
                # scales jump to a Newton-like target and NaN) — pick
                # the better of {natgrad proposal, keep-current} under
                # the step's own batch objective
                def with_q(mu, sq):
                    p2 = dict(params, q_mu=mu, q_sqrt_raw=sq)
                    fl, _ = ravel_pytree(p2)
                    return fl
                fl_prop = with_q(q_mu_new, q_sqrt_new)
                fl_keep = with_q(params["q_mu"], Lq)
                l_prop = f_batch(fl_prop, idx)
                l_keep = f_batch(fl_keep, idx)
                take = jnp.isfinite(l_prop) & (l_prop <= l_keep)
                flat = jnp.where(take, fl_prop, fl_keep)
            else:
                params = dict(params, q_mu=q_mu_new,
                              q_sqrt_raw=q_sqrt_new)
                flat, _ = ravel_pytree(params)

        def checkpoint(args):
            flat, snapshot, last_loss, done = args
            cur = f_full(flat)
            bad = ~jnp.isfinite(cur)
            flat = jnp.where(bad, snapshot, flat)
            converged = (last_loss - cur) < convergence_threshold
            return flat, jnp.where(bad, snapshot, flat), cur, bad | converged

        flat, snapshot, last_loss, done = jax.lax.cond(
            (it + 1) % check_every == 0, checkpoint, lambda a: a,
            (flat, snapshot, last_loss, done),
        )
        return flat, opt_state, snapshot, last_loss, it + 1, done, k

    def cond(carry):
        *_, it, done, _k = carry
        return (it < num_opt_iter) & ~done

    init = (flat0, opt.init(flat0), flat0,
            jnp.asarray(jnp.inf, dtype=flat0.dtype), jnp.asarray(0),
            jnp.asarray(False), key)
    flat_fin, _, snapshot, _, it, _, _ = jax.lax.while_loop(cond, body,
                                                            init)
    final_loss = f_full(flat_fin)
    bad = ~jnp.isfinite(final_loss)
    flat_out = jnp.where(bad, snapshot, flat_fin)
    return MinibatchResult(unravel(flat_out), f_full(flat_out), it)
