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

    # PRECISION NOTE: all scores below are built from POINTWISE log-lik
    # differences summed, never from differences of separately-summed
    # totals. At the real iHMP intensity scale (Y ~ 1e10, f32 on chip)
    # per-point lls can be ~1e6, so summed totals (~1e9) quantize at ULP
    # ~64-65536 and sum-then-subtract destroys the scores — the round-3
    # real-data run produced exact powers of two. Pointwise differences
    # carry per-point error ~|ll_n|·eps instead of ~|Σll|·eps.
    d_sat = jnp.sum(sat_lls - mod_lls)   # ≥ 0: saturated minus model
    d_null = jnp.sum(mod_lls - null_lls)  # ≥ 0 when model beats null

    # full-model deviance explained (utilities.py:641-649):
    # 1 − (sat−mod)/(sat−null) with sat−null = d_sat + d_null
    ordered = (d_sat >= 0) & (d_null >= 0)
    full_de = jnp.where(
        ordered,
        jnp.clip(1.0 - d_sat / jnp.maximum(d_sat + d_null, 1e-30),
                 0.0, 1.0),
        0.0,
    )

    def leave_out(c):
        mask = component_mask * (1.0 - jax.nn.one_hot(c, C, dtype=X.dtype))
        mu, _ = svgp.predict_y(config, params, X, component_mask=mask,
                               factor_mask=factor_mask)
        _, sub_lls, _ = deviance_logliks(lik, lik_p, Y, mu)
        return jnp.sum(mod_lls - sub_lls)  # pointwise difference

    d_sub = jax.vmap(leave_out)(jnp.arange(C))  # (C,) = s_mod − sub_sums

    if return_value == "statistic":
        vals = jnp.maximum(jnp.round(2.0 * d_sub, 1), 0.0)
    elif return_value == "log_bf":
        vals = jnp.round(d_sub, 1)
    else:  # deviance explained per component (utilities.py:680-685)
        de = 1.0 - d_sub / jnp.maximum(d_null, 1e-30)
        vals = jnp.round(jnp.clip(de, 0.0, 1.0), 3)

    vals = jnp.where(component_mask > 0, vals, 0.0)
    residual = jnp.round(1.0 - full_de, 3)
    return jnp.concatenate([vals, residual[None]])
