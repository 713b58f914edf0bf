"""Per-component feature importance via leave-one-component-out deviance.

Re-implements ``calc_feature_importance_components`` (utilities.py:614-707):
for each additive kernel component, compare the deviance of the full model
to the model with that component removed (refit-free). Returns per-component
log Bayes factor (default), chi-square statistic, or deviance explained,
with the residual share ``1 − full_de`` appended last.

TPU-native structure: "removing" component c is a component-mask, so all C
leave-one-out predictions are a single vmapped predict_y over one-cold
masks — C+1 SVGP conditionals in one XLA program instead of C+1 sequential
GPflow model deep-copies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import svgp
from .metrics import deviance_logliks


def feature_importance(
    config,
    params,
    X,
    Y,
    component_mask=None,
    factor_mask=None,
    return_value: str = "log_bf",
):
    """(C+1,) importance vector (last entry = residual share).

    ``component_mask``: current active components (post-pruning); masked
    components get importance 0 (they're structurally absent).
    """
    C = config.num_components
    lik = config.likelihood
    lik_p = lik.constrain(params["lik_raw"])
    if component_mask is None:
        component_mask = jnp.ones((C,), dtype=X.dtype)

    full_mu, _ = svgp.predict_y(config, params, X,
                                component_mask=component_mask,
                                factor_mask=factor_mask)
    null_lls, mod_lls, sat_lls = deviance_logliks(lik, lik_p, Y, full_mu)

    # full-model deviance explained (utilities.py:641-649)
    s_sat, s_mod, s_null = (jnp.sum(sat_lls), jnp.sum(mod_lls),
                            jnp.sum(null_lls))
    ordered = (s_sat >= s_mod) & (s_mod >= s_null)
    full_de = jnp.where(
        ordered,
        jnp.clip(
            1.0 - (-2.0 * (s_mod - s_sat)) / (-2.0 * (s_null - s_sat)),
            0.0, 1.0,
        ),
        0.0,
    )

    def leave_out(c):
        mask = component_mask * (1.0 - jax.nn.one_hot(c, C, dtype=X.dtype))
        mu, _ = svgp.predict_y(config, params, X, component_mask=mask,
                               factor_mask=factor_mask)
        _, sub_lls, _ = deviance_logliks(lik, lik_p, Y, mu)
        return jnp.sum(sub_lls)

    sub_sums = jax.vmap(leave_out)(jnp.arange(C))

    if return_value == "statistic":
        vals = jnp.maximum(
            jnp.round(-2.0 * (sub_sums - s_mod), 1), 0.0
        )
    elif return_value == "log_bf":
        vals = jnp.round(s_mod - sub_sums, 1)
    else:  # deviance explained per component (utilities.py:680-685)
        de = 1.0 - (-2.0 * (sub_sums - s_mod)) / (-2.0 * (s_null - s_mod))
        vals = jnp.round(jnp.clip(de, 0.0, 1.0), 3)

    vals = jnp.where(component_mask > 0, vals, 0.0)
    residual = jnp.round(1.0 - full_de, 3)
    return jnp.concatenate([vals, residual[None]])
