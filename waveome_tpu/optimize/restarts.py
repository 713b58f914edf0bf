"""Random-restart optimization driver.

Mirrors ``BaseGP.random_restart_optimize`` (model_classes.py:472-524):
randomize trainable parameters, optimize, keep the best by maximum
log-likelihood objective. The TPU-native twist: restarts are a *vmapped
axis* — all restarts fit simultaneously in one XLA program and the best is
selected with an argmax, instead of a sequential Python loop.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .lbfgs import lbfgs_fit


def random_restart_fit(
    loss_fn: Callable,
    params0: dict,
    randomize_fn: Callable,
    key: jax.Array,
    num_restart: int = 5,
    include_default_init: bool = True,
    mask=None,
    fit_fn: Optional[Callable] = None,
    **fit_kwargs,
):
    """Fit with ``num_restart`` random initializations (vmapped) and return
    the best parameter pytree and its loss.

    ``randomize_fn(params, key) -> params`` draws a random init (the
    counterpart of randomize_params, model_classes.py:181-234).
    ``fit_fn(loss_fn, params, mask=..., **kw)`` defaults to L-BFGS.
    """
    fit = fit_fn or (
        lambda lf, p, mask=None: lbfgs_fit(lf, p, mask=mask, **fit_kwargs)
    )

    keys = jax.random.split(key, max(num_restart, 1))
    inits = jax.vmap(lambda k: randomize_fn(params0, k))(keys)
    if include_default_init:
        inits = jax.tree.map(
            lambda d, r: jnp.concatenate([d[None], r], axis=0), params0, inits
        )

    def one(p):
        res = fit(loss_fn, p, mask=mask)
        return res.params, res.loss

    all_params, all_losses = jax.vmap(one)(inits)
    # NaN-safe best pick (failed restarts roll back, may still be NaN)
    losses = jnp.where(jnp.isfinite(all_losses), all_losses, jnp.inf)
    best = jnp.argmin(losses)
    best_params = jax.tree.map(lambda a: a[best], all_params)
    return best_params, all_losses[best]
