"""Simulation generators and evaluation metrics — the integration/eval
harness (SURVEY.md §4, milestone 11).

Re-provides, as data generators over our KernelSpec machinery:

  * the 4 ground-truth longitudinal kernels of the kernel-recovery
    simulation study (kernel_learning/simulation_test.py:142-174);
  * GP-draw simulation of longitudinal designs (unit / treatment / time);
  * the sim-harness quality metrics (examples/simulations/
    sim_waveome_hpc_run.py:370-451): holdout KL divergence to the true
    predictive distribution, MSE, and feature-recovery scoring
    (retrieve_features_in_models, :192-219).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .kernels.gram import gram
from .kernels.spec import KernelSpec, Primitive


def longitudinal_design(num_units: int = 10, rate: int = 10,
                        seed: Optional[int] = None) -> np.ndarray:
    """X = [unit id, binary treatment, time] — the simulation design of
    simulation_test.py (unit-level treatment, `rate` observations per unit
    on [0, 1])."""
    rng = np.random.default_rng(seed)
    ids = np.repeat(np.arange(num_units), rate).astype(float)
    treat = np.repeat((rng.random(num_units) < 0.5).astype(float), rate)
    time = np.tile(np.sort(rng.random(rate)), num_units)
    return np.column_stack([ids, treat, time])


def ground_truth_specs() -> Dict[str, Tuple[KernelSpec, np.ndarray]]:
    """The four ground-truth kernels (simulation_test.py:142-174) as
    (spec, constrained-variance/lengthscale settings).

    Returns name → (KernelSpec, raw_params) with parameters set to the
    study's values.
    """
    from .bijectors import softplus_inv
    import jax.numpy as jnp

    def set_p(spec: KernelSpec, settings):
        raw = np.array(spec.init_raw_params(dtype=jnp.float64))
        for (i, j, slot), val in settings.items():
            raw[i, j, slot] = float(np.log(np.expm1(val)))
        return jnp.asarray(raw)

    out = {}
    # y1: Matern12(t; v=1, ls=1) + Categorical(unit; v=2)
    s1 = KernelSpec((
        (Primitive("matern12", 2),),
        (Primitive("categorical", 0),),
    ))
    out["y1"] = (s1, set_p(s1, {(0, 0, 0): 1.0, (0, 0, 1): 1.0,
                                (1, 0, 0): 2.0}))
    # y2: Matern12(t; ls=.5) * Cat(unit) + Periodic(t; v=2, period=.5)
    s2 = KernelSpec((
        (Primitive("matern12", 2), Primitive("categorical", 0)),
        (Primitive("periodic", 2),),
    ))
    out["y2"] = (s2, set_p(s2, {(0, 0, 0): 1.0, (0, 0, 1): 0.5,
                                (0, 1, 0): 1.0,
                                (1, 0, 0): 2.0, (1, 0, 1): 1.0,
                                (1, 0, 2): 0.5}))
    # y3: Cat(unit; v=2) + Cat(treat) * Linear(t)
    s3 = KernelSpec((
        (Primitive("categorical", 0),),
        (Primitive("categorical", 1), Primitive("linear", 2)),
    ))
    out["y3"] = (s3, set_p(s3, {(0, 0, 0): 2.0, (1, 0, 0): 1.0,
                                (1, 1, 0): 1.0}))
    # y4: Cat(treat; v=1.5)*Poly(t; deg3, offset .1) + Cat(unit; v=1.5)*SE(t; ls=.5)
    s4 = KernelSpec((
        (Primitive("categorical", 1),
         Primitive("polynomial", 2, degree=3.0)),
        (Primitive("categorical", 0),
         Primitive("squared_exponential", 2)),
    ))
    out["y4"] = (s4, set_p(s4, {(0, 0, 0): 1.5, (0, 1, 0): 1.0,
                                (0, 1, 2): 0.1,
                                (1, 0, 0): 1.5, (1, 1, 0): 1.0,
                                (1, 1, 1): 0.5}))
    return out


def simulate_gp_outcomes(
    X: np.ndarray,
    spec: KernelSpec,
    raw_params,
    noise_sd: float = 0.3,
    num_outcomes: int = 1,
    seed: Optional[int] = None,
    likelihood: str = "gaussian",
    alpha: float = 1.0,
    return_latent: bool = False,
) -> np.ndarray:
    """Draw outcomes from a GP with the given kernel + observation model
    (the sim harness's generator, sim_waveome_hpc_run.py:90-190).

    Count outcomes follow the reference's NB generator exactly
    (sim_waveome_hpc_run.py:144-186): latent f ~ GP, latent noise
    ``noise_sd`` (the harness's ``eps``) added to f, mean m = exp(f+ε),
    variance σ² = m + α·m², y ~ NB(n = m²/(σ²−m) = 1/α, p = m/σ²).
    ``return_latent`` also returns the realized per-row likelihood
    params (the harness's ``likelihood_params``) — the KL-to-truth
    metric scores each model's predictive against THIS realized truth.
    """
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    N = X.shape[0]
    # host-side simulator: factorize in numpy float64 with a jitter scaled
    # to the gram magnitude (the device gram may be float32)
    K = np.asarray(
        gram(spec, raw_params, jnp.asarray(X, jnp.float64))
    ).astype(np.float64)
    jit = 1e-6 * max(float(np.max(np.diag(K))), 1.0)
    # escalating-jitter retry: without x64 the device gram is float32, and
    # large-N grids (the full 576-combination sweep reaches N=8000) land
    # grams whose f32 rounding exceeds a fixed 1e-6 ridge
    L = None
    for _ in range(8):
        try:
            L = np.linalg.cholesky(K + jit * np.eye(N))
            break
        except np.linalg.LinAlgError:
            jit *= 10.0
    if L is None:
        # symmetric eigenvalue floor — always factorizable
        w, V = np.linalg.eigh((K + K.T) / 2.0)
        L = V * np.sqrt(np.maximum(w, jit))[None, :]
    F = L @ rng.normal(size=(N, num_outcomes))
    if likelihood == "gaussian":
        Y = F + noise_sd * rng.normal(size=F.shape)
        if return_latent:
            return Y, {"f": F, "noise_sd": noise_sd}
        return Y
    if likelihood == "poisson":
        Y = rng.poisson(np.exp(F)).astype(float)
        if return_latent:
            return Y, {"f": F, "mean": np.exp(F)}
        return Y
    if likelihood in ("negative_binomial", "negativebinomial"):
        f_noise = F + noise_sd * rng.normal(size=F.shape)
        m = np.exp(f_noise)
        sigma2 = m + alpha * m ** 2
        p = m / sigma2
        n = m ** 2 / (sigma2 - m)
        Y = rng.negative_binomial(n, p).astype(float)
        if return_latent:
            return Y, {"f": F, "mean": m, "n": n, "p": p, "alpha": alpha}
        return Y
    raise ValueError(f"unsupported simulation likelihood {likelihood}")


# ---------------------------------------------------------------------------
# evaluation metrics (sim_waveome_hpc_run.py:370-451)
# ---------------------------------------------------------------------------


def gaussian_kl(mu_true, var_true, mu_est, var_est):
    """Pointwise KL(N_true ‖ N_est), averaged — the harness's
    KL-to-truth metric (calc_kl_all)."""
    mu_true = np.asarray(mu_true).reshape(-1)
    var_true = np.asarray(var_true).reshape(-1)
    mu_est = np.asarray(mu_est).reshape(-1)
    var_est = np.asarray(var_est).reshape(-1)
    kl = 0.5 * (
        np.log(var_est / var_true)
        + (var_true + (mu_true - mu_est) ** 2) / var_est
        - 1.0
    )
    return float(np.mean(kl))


def nb_kl_to_truth(n_true, p_true, y, log_q) -> float:
    """Mean log-density ratio of truth vs model at the observed counts —
    ``calc_kl_all`` (sim_waveome_hpc_run.py:370-451): p_x is the true
    NB pmf at y, q_x the model's predictive density at y, both
    truncated to [0.001, 0.999]; returns mean(log(p_x/q_x))."""
    from scipy.stats import nbinom

    y = np.asarray(y).reshape(-1)
    p_x = nbinom(n=np.asarray(n_true).reshape(-1),
                 p=np.asarray(p_true).reshape(-1)).pmf(y)
    q_x = np.exp(np.asarray(log_q, dtype=np.float64).reshape(-1))
    q_x[~np.isfinite(q_x)] = 0.0
    p_x = np.clip(p_x, 0.001, 0.999)
    q_x = np.clip(q_x, 0.001, 0.999)
    return float(np.mean(np.log(p_x / q_x)))


def holdout_mse(y_true, y_pred) -> float:
    return float(np.mean(
        (np.asarray(y_true).reshape(-1) - np.asarray(y_pred).reshape(-1))
        ** 2
    ))


def features_in_name(kernel_name: str) -> List[int]:
    """Feature indices appearing in a fitted kernel-name string."""
    import re

    return sorted({int(d) for d in re.findall(r"\[(\d+)\]", kernel_name)})


def feature_recovery_score(true_features: Sequence[int],
                           kernel_name: str) -> Dict[str, float]:
    """Precision/recall of recovered features vs ground truth
    (retrieve_features_in_models, sim_waveome_hpc_run.py:192-219)."""
    found = set(features_in_name(kernel_name))
    truth = set(true_features)
    tp = len(found & truth)
    precision = tp / len(found) if found else 0.0
    recall = tp / len(truth) if truth else 1.0
    return {"precision": precision, "recall": recall,
            "exact": float(found == truth)}
