from .importance import feature_importance
from .metrics import (
    calc_bhattacharyya_dist,
    calc_bic,
    calc_deviance_explained,
    calc_residuals,
    calc_rsquare_components,
    calc_rsquare_total,
    deviance_logliks,
)

__all__ = [
    "feature_importance",
    "calc_bhattacharyya_dist",
    "calc_bic",
    "calc_deviance_explained",
    "calc_residuals",
    "calc_rsquare_components",
    "calc_rsquare_total",
    "deviance_logliks",
]
