"""Sparse variational GP as pure functions over a parameter pytree.

TPU-native replacement for the reference's GPflow SVGP model hierarchy
(``model_classes.py:33-1126`` — BaseGP/VarGP/SparseGP/PenalizedGP/PSVGP).
Instead of a cooperative-inheritance object graph, a model is:

  * a static ``SVGPConfig`` (kernel spec, likelihood, inducing count, flags),
  * a parameter pytree ``params`` (kernel raw params, constant mean,
    likelihood raw params, whitened variational (q_mu, q_sqrt), inducing Z),
  * pure functions ``elbo`` / ``log_posterior`` / ``predict_f`` / ``predict_y``
    that jit, grad, and vmap over outcome batches.

Math follows the standard whitened SVGP equations (the same ones GPflow
evaluates): with L = chol(Kuu), A = L⁻¹ Kuf,
    q(f) = N(Aᵀ q_mu + m(X), Kff − AᵀA + Aᵀ S A),  S = q_sqrt q_sqrtᵀ
    KL(q(u)‖N(0,I)) in whitened coordinates,
    ELBO = Σₙ E_q[log p(yₙ|fₙ)] − KL.

The per-component ``component_mask`` argument reproduces, with static
shapes, the reference's structural edits: pruning
(model_classes.py:1029-1079), leave-one-component-out importances
(utilities.py:651-668), and sub-kernel ("marginal") component posteriors
(utilities.py:819-834).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..bijectors import softplus_inv, to_tril
from ..config import default_float, default_jitter
from ..kernels.gram import (
    component_variances,
    gram,
    gram_coded,
    gram_diag,
    gram_diag_coded,
)
from ..kernels.spec import KernelSpec
from ..likelihoods import Likelihood, gp_likelihood_crosswalk
from ..priors import horseshoe_log_prob


@dataclasses.dataclass(frozen=True)
class SVGPConfig:
    """Static model description (hashable; safe as a jit static argument)."""

    spec: KernelSpec
    likelihood: Likelihood
    num_inducing: int
    input_dim: int
    train_inducing: bool = False
    whiten: bool = True
    mean_function: str = "constant"  # "constant" | "zero"
    coded_structure: bool = False  # runtime op-code dispatch (search batching)
    coded_ops: tuple = ()  # static op-code table restricting coded dispatch
    # static identity of the fused banked gram (kernels/fused.py) — when
    # set AND a caller passes `banks=`, coded grams route through the
    # GEMM-banked path instead of the per-factor switch dispatch
    fused_layout: Optional["FusedLayout"] = None  # noqa: F821

    @property
    def num_components(self) -> int:
        return self.spec.padded().num_components


def make_config(
    spec: KernelSpec,
    likelihood: str = "gaussian",
    num_data: int = 0,
    input_dim: int = 1,
    num_inducing_points: int = 500,
    train_inducing: bool = True,
    coded_structure: bool = False,
    coded_ops: tuple = (),
    fused_layout=None,
) -> SVGPConfig:
    """Inducing-point sizing rules of SparseGP (model_classes.py:724-737):
    if M ≥ N use all data and freeze."""
    lik = (
        likelihood
        if isinstance(likelihood, Likelihood)
        else gp_likelihood_crosswalk(likelihood)
    )
    M = min(num_inducing_points, num_data) if num_data else num_inducing_points
    if num_data and num_inducing_points >= num_data:
        train_inducing = False
    return SVGPConfig(
        spec=spec,
        likelihood=lik,
        num_inducing=M,
        input_dim=input_dim,
        train_inducing=train_inducing,
        coded_structure=coded_structure,
        coded_ops=tuple(coded_ops),
        fused_layout=fused_layout,
    )


def init_params(
    config: SVGPConfig,
    X: jnp.ndarray,
    key: Optional[jax.Array] = None,
    dtype=None,
):
    """Initialise the parameter pytree.

    Inducing points: all data when M == N (BaseGP, model_classes.py:98-107),
    else a random subset (SparseGP, model_classes.py:740-754).
    Variational: q_mu = 0, q_sqrt = I (gpflow default init).
    """
    dtype = dtype or default_float()
    X = jnp.asarray(X, dtype=dtype)
    N = X.shape[0]
    M = config.num_inducing
    if M >= N:
        Z = X[:M]
    else:
        if key is None:
            key = jax.random.PRNGKey(0)
        idx = jax.random.choice(key, N, shape=(M,), replace=False)
        Z = X[idx]
    spec = config.spec
    return {
        "kernel_raw": spec.init_raw_params(dtype=dtype),
        "mean_c": jnp.zeros((1,), dtype=dtype),
        "lik_raw": config.likelihood.init_raw(dtype=dtype),
        "q_mu": jnp.zeros((M, 1), dtype=dtype),
        "q_sqrt_raw": jnp.eye(M, dtype=dtype),
        "z": Z,
    }


def train_mask(config: SVGPConfig, params) -> dict:
    """Boolean pytree of trainable entries — replaces gpflow's
    set_trainable bookkeeping (model_classes.py:169, :774)."""
    M = config.num_inducing
    return {
        "kernel_raw": config.spec.train_mask(),
        "mean_c": jnp.ones((1,), dtype=bool)
        if config.mean_function == "constant"
        else jnp.zeros((1,), dtype=bool),
        "lik_raw": jnp.ones_like(params["lik_raw"], dtype=bool),
        "q_mu": jnp.ones_like(params["q_mu"], dtype=bool),
        "q_sqrt_raw": jnp.tril(jnp.ones((M, M), dtype=bool)),
        "z": jnp.full(params["z"].shape, config.train_inducing, dtype=bool),
    }


def train_mask_np(config: SVGPConfig) -> dict:
    """STATIC numpy twin of ``train_mask`` — shapes are static even inside
    jit traces, and a numpy mask lets the L-BFGS fitters use subset
    optimization (optimization vector = free entries only) instead of
    full-vector gradient masking."""
    M = config.num_inducing
    return {
        "kernel_raw": config.spec.train_mask_np(),
        "mean_c": (np.ones((1,), dtype=bool)
                   if config.mean_function == "constant"
                   else np.zeros((1,), dtype=bool)),
        "lik_raw": np.ones((config.likelihood.n_params,), dtype=bool),
        "q_mu": np.ones((M, 1), dtype=bool),
        "q_sqrt_raw": np.tril(np.ones((M, M), dtype=bool)),
        "z": np.full((M, config.input_dim), config.train_inducing,
                     dtype=bool),
    }


def num_trainable_params(config: SVGPConfig, params) -> int:
    m = train_mask(config, params)
    return int(sum(np.asarray(v).sum() for v in jax.tree.leaves(m)))


# ---------------------------------------------------------------------------
# gram helpers honoring static/coded dispatch
# ---------------------------------------------------------------------------


def _K(config, params, X1, X2=None, component_mask=None, coded=None,
       factor_mask=None, banks=None):
    if banks is not None and config.fused_layout is not None:
        # fused banked gram — caller contract: X1 and X2 are both the
        # banked design matrix (kernels/fused.py)
        from ..kernels.fused import gram_coded_fused

        return gram_coded_fused(config.fused_layout, coded,
                                params["kernel_raw"], banks,
                                component_mask)
    if config.coded_structure:
        return gram_coded(coded, params["kernel_raw"], X1, X2,
                          component_mask,
                          ops_table=config.coded_ops or None)
    return gram(config.spec, params["kernel_raw"], X1, X2, component_mask,
                factor_mask)


def _Kdiag(config, params, X, component_mask=None, coded=None,
           factor_mask=None, banks=None):
    if banks is not None and config.fused_layout is not None:
        from ..kernels.fused import gram_diag_coded_fused

        return gram_diag_coded_fused(config.fused_layout, coded,
                                     params["kernel_raw"], banks,
                                     component_mask)
    if config.coded_structure:
        return gram_diag_coded(coded, params["kernel_raw"], X,
                               component_mask,
                               ops_table=config.coded_ops or None)
    return gram_diag(config.spec, params["kernel_raw"], X, component_mask,
                     factor_mask)


def _mean(config, params, X):
    if config.mean_function == "constant":
        return jnp.full((X.shape[0], 1), params["mean_c"][0])
    return jnp.zeros((X.shape[0], 1), dtype=X.dtype)


def _chol(K):
    """Cholesky with forward-only Pallas dispatch: inside a
    ``forward_pallas`` trace context (line-search trials — never
    differentiated) eligible factorizations can run the VMEM-resident
    Pallas kernel (pallas_ops/chol_pallas.py); gradient evaluations and
    CPU/f64 paths keep XLA's cholesky.

    Default OFF (WAVEOME_PALLAS_CHOL=1 opts in), with receipts: the
    lane-batched hybrid (pallas_ops/chol_pallas.py cholesky_auto) is
    correct on well-conditioned matrices but its explicit-inverse panel
    solve amplifies rounding by cond(L11) on REAL fit grams (K + sigma^2
    I): tools/chol_accuracy.py measures logdet errors of 0.05-0.2 at
    sigma^2=1 and NaN at sigma^2=0.09 on RBF grams, and the end-to-end
    A/B (tools/chol_ab.py, chip) shows every bench fit converging
    prematurely (mean final penalized NLL +140 units, iters 42 -> 21).
    An earlier 14.1 ms-vs-30.3 ms microbench claim is withdrawn: on the
    tunneled backend jax.block_until_ready does NOT synchronize, so
    wall-clock microbenches without a host fetch measure nothing
    (tools/chol_bench.py now forces a device->host fetch)."""
    import os
    import sys

    gramlib = sys.modules["waveome_tpu.kernels.gram"]
    if (os.environ.get("WAVEOME_PALLAS_CHOL", "0") == "1"
            and gramlib._PALLAS_FORWARD_CTX
            and K.dtype == jnp.float32
            and jax.default_backend() in ("tpu", "axon")):
        from ..pallas_ops.chol_pallas import cholesky_auto, hybrid_supported

        if hybrid_supported(K.shape[-1]):
            return cholesky_auto(K)
    # blocked right-looking form (linalg.py): auto-on for TPU f32 at
    # N >= 256 — 4.3x faster than XLA's native batched factorization at
    # the production shape, stable TRSM panels (no explicit inverse)
    from ..linalg import cholesky as _blocked_or_native

    return _blocked_or_native(K)


# ---------------------------------------------------------------------------
# core math
# ---------------------------------------------------------------------------


def _conditional(config, params, Xnew, component_mask=None, coded=None,
                 full_cov: bool = False, factor_mask=None, banks=None):
    """Whitened SVGP conditional q(f(Xnew)) → (mean, var-or-cov).

    ``banks`` (fused path) carries the contract Z == Xnew == banked X
    (the M ≥ N search/fit case): Kuu and Kuf are then the SAME matrix,
    computed once — half the gram work of the generic path."""
    Z = params["z"]
    jitter = default_jitter()
    if banks is not None and config.fused_layout is not None:
        K = _K(config, params, Z, Z, component_mask, coded, banks=banks)
        Kuu = K + jitter * jnp.eye(Z.shape[0], dtype=K.dtype)
        Kuf = K
    else:
        Kuu = _K(config, params, Z, Z, component_mask, coded, factor_mask)
        Kuu = Kuu + jitter * jnp.eye(Z.shape[0], dtype=Kuu.dtype)
        Kuf = _K(config, params, Z, Xnew, component_mask, coded,
                 factor_mask)
    L = _chol(Kuu)
    A = jax.scipy.linalg.solve_triangular(L, Kuf, lower=True)  # (M, N)

    q_mu = params["q_mu"]
    q_sqrt = to_tril(params["q_sqrt_raw"])

    fmean = A.T @ q_mu + _mean(config, params, Xnew)
    SA = q_sqrt.T @ A  # (M, N)
    if full_cov:
        Kff = _K(config, params, Xnew, Xnew, component_mask, coded,
                 factor_mask, banks=banks)
        fcov = Kff - A.T @ A + SA.T @ SA
        return fmean, fcov
    Kdiag = _Kdiag(config, params, Xnew, component_mask, coded,
                   factor_mask, banks=banks)
    fvar = Kdiag - jnp.sum(A * A, axis=0) + jnp.sum(SA * SA, axis=0)
    return fmean, fvar[:, None]


def kl_whitened(params):
    """KL(q(u) ‖ N(0, I)) for whitened q with lower-tri q_sqrt."""
    q_mu = params["q_mu"]
    Lq = to_tril(params["q_sqrt_raw"])
    M = q_mu.shape[0]
    mahal = jnp.sum(q_mu ** 2)
    trace = jnp.sum(Lq ** 2)
    # |diag| floored: a zero-crossing diagonal during line search must give
    # a large-but-finite KL with finite gradient, not ±inf
    diag = jnp.maximum(jnp.abs(jnp.diag(Lq)), 1e-150)
    logdet = 2.0 * jnp.sum(jnp.log(diag))
    return 0.5 * (mahal + trace - M - logdet)


def elbo(config: SVGPConfig, params, X, Y, component_mask=None, coded=None,
         scale: float = 1.0, factor_mask=None, weights=None, banks=None):
    """Evidence lower bound (gpflow SVGP.elbo semantics;
    model_classes.py:817-835 uses this as the MLL objective).

    ``weights``: optional per-observation weights on the variational
    expectations. Weight-0 rows are excluded from the data term — the
    shape-static equivalent of np.delete'ing CV-fold rows
    (model_classes.py:902-905), which lets all folds share one compiled
    program and batch in a single vmap.
    """
    fmean, fvar = _conditional(config, params, X, component_mask, coded,
                               factor_mask=factor_mask, banks=banks)
    lik_p = config.likelihood.constrain(params["lik_raw"])
    ve = config.likelihood.variational_expectations(
        lik_p, fmean[:, 0], fvar[:, 0], Y[:, 0]
    )
    if weights is not None:
        ve = ve * weights
    return scale * jnp.sum(ve) - kl_whitened(params)


def log_prior_density(config: SVGPConfig, params,
                      penalization_factor: float = 0.0):
    """Horseshoe(1/λ) prior over trainable kernel variances
    (PenalizedGP.set_penalization_factor, model_classes.py:837-864)."""
    dtype = params["kernel_raw"].dtype
    if penalization_factor is None:
        return jnp.zeros((), dtype=dtype)
    if isinstance(penalization_factor, (int, float)) and (
        penalization_factor <= 0
    ):
        # static no-penalty path (PSVGP with penalization 0,
        # model_search.py:2275) — avoids inf-scale NaN gradients
        return jnp.zeros((), dtype=dtype)
    factor = jnp.asarray(penalization_factor, dtype=dtype)
    # safe for traced factor == 0: gate forward AND keep gradients finite
    safe_factor = jnp.maximum(factor, jnp.asarray(1e-30, dtype=dtype))
    mask = config.spec.variance_prior_mask()
    from ..kernels.gram import constrain as _constrain

    variances = _constrain(params["kernel_raw"])[..., 0]  # (C, F)
    lp = horseshoe_log_prob(variances, 1.0 / safe_factor)
    total = jnp.sum(jnp.where(mask, lp, 0.0))
    return jnp.where(factor > 0, total, 0.0)


def log_posterior(config: SVGPConfig, params, X, Y,
                  penalization_factor: float = 0.0,
                  component_mask=None, coded=None, scale: float = 1.0,
                  factor_mask=None, weights=None, banks=None):
    """ELBO + prior log-density (gpflow log_posterior_density; this is what
    the reference's training_loss minimises and what BIC consumes,
    model_search.py:2311)."""
    return elbo(config, params, X, Y, component_mask, coded, scale,
                factor_mask=factor_mask, weights=weights, banks=banks) + (
        log_prior_density(config, params, penalization_factor)
    )


def training_loss(config: SVGPConfig, params, X, Y,
                  penalization_factor: float = 0.0,
                  component_mask=None, coded=None, scale: float = 1.0,
                  factor_mask=None, weights=None, banks=None):
    return -log_posterior(config, params, X, Y, penalization_factor,
                          component_mask, coded, scale,
                          factor_mask=factor_mask, weights=weights,
                          banks=banks)


# ---------------------------------------------------------------------------
# collapsed (SGPR / Titsias) bound — Gaussian likelihood fast path
# ---------------------------------------------------------------------------


def exact_mll(config: SVGPConfig, params, X, Y, component_mask=None,
              coded=None, factor_mask=None, banks=None):
    """Exact Gaussian log marginal likelihood (Cholesky of K+σ²I).

    Used as the Gaussian fast-path objective when the inducing set is the
    full data (the reference BaseGP default, model_classes.py:98-107) —
    mathematically the M=N collapsed bound without its
    float32-catastrophic trace/quad cancellations: every term here is a
    stable Cholesky solve.
    """
    assert config.likelihood.name == "gaussian"
    N = X.shape[0]
    dtype = X.dtype
    noise = config.likelihood.constrain(params["lik_raw"])[0]
    K = _K(config, params, X, X, component_mask, coded, factor_mask,
           banks=banks)
    Ky = K + noise * jnp.eye(N, dtype=dtype)
    L = _chol(Ky)
    err = (Y - _mean(config, params, X))[:, 0]
    a = jax.scipy.linalg.cho_solve((L, True), err)
    return (
        -0.5 * jnp.sum(err * a)
        - jnp.sum(jnp.log(jnp.diag(L)))
        - 0.5 * N * math.log(2.0 * math.pi)
    )


def collapsed_elbo(config: SVGPConfig, params, X, Y, component_mask=None,
                   coded=None, factor_mask=None):
    """max_q ELBO in closed form (Gaussian likelihood only).

    log N(y; c, Qnn + σ²I) − tr(Knn − Qnn)/(2σ²), computed via the
    standard B = I + AAᵀ/σ² factorization. Optimizing this over
    hyperparameters is exactly equivalent to jointly optimizing the
    explicit-q ELBO (the reference's scipy path optimizes (q, θ) jointly,
    model_classes.py:299-342) but exposes only ~10 parameters to L-BFGS —
    the TPU fast path for the penalized pipeline.
    """
    assert config.likelihood.name == "gaussian"
    Z = params["z"]
    M = Z.shape[0]
    N = X.shape[0]
    dtype = X.dtype
    jitter = default_jitter()
    noise = config.likelihood.constrain(params["lik_raw"])[0]

    Kuu = _K(config, params, Z, Z, component_mask, coded, factor_mask)
    Kuu = Kuu + jitter * jnp.eye(M, dtype=dtype)
    L = _chol(Kuu)
    Kuf = _K(config, params, Z, X, component_mask, coded, factor_mask)
    A = jax.scipy.linalg.solve_triangular(L, Kuf, lower=True)  # (M, N)

    err = (Y - _mean(config, params, X))[:, 0]
    B = jnp.eye(M, dtype=dtype) + (A @ A.T) / noise
    LB = _chol(B)
    # Quadratic form in residual form: errᵀ(Q+σ²I)⁻¹err = errᵀr/σ² with
    # r = err − AᵀB⁻¹A err/σ². The textbook −½‖err‖²/σ² + ½‖c‖² form
    # catastrophically cancels in float32 when σ² approaches its floor
    # (both terms ~‖err‖²/σ² ≫ their difference); the residual form keeps
    # every intermediate O(‖err‖²).
    Aerr = A @ err
    w = jax.scipy.linalg.cho_solve((LB, True), Aerr) / noise
    r = err - A.T @ w
    quad = jnp.sum(err * r) / noise

    Kdiag = _Kdiag(config, params, X, component_mask, coded, factor_mask)
    bound = (
        -0.5 * N * jnp.log(2.0 * math.pi)
        - jnp.sum(jnp.log(jnp.diag(LB)))
        - 0.5 * N * jnp.log(noise)
        - 0.5 * quad
        - 0.5 * (jnp.sum(Kdiag) - jnp.sum(A * A)) / noise
    )
    return bound


def optimal_q(config: SVGPConfig, params, X, Y, component_mask=None,
              coded=None, factor_mask=None, banks=None):
    """Closed-form optimal whitened (q_mu, q_sqrt) for Gaussian likelihood:
    Σ = (I + AAᵀ/σ²)⁻¹, q_mu = Σ A (y−c)/σ², q_sqrt = chol(Σ)."""
    Z = params["z"]
    M = Z.shape[0]
    dtype = X.dtype
    jitter = default_jitter()
    noise = config.likelihood.constrain(params["lik_raw"])[0]
    if banks is not None and config.fused_layout is not None:
        # banked contract: Z == X, so Kuu and Kuf are one matrix
        K = _K(config, params, Z, Z, component_mask, coded, banks=banks)
        Kuu = K + jitter * jnp.eye(M, dtype=dtype)
        Kuf = K
    else:
        Kuu = _K(config, params, Z, Z, component_mask, coded, factor_mask)
        Kuu = Kuu + jitter * jnp.eye(M, dtype=dtype)
        Kuf = _K(config, params, Z, X, component_mask, coded, factor_mask)
    L = _chol(Kuu)
    A = jax.scipy.linalg.solve_triangular(L, Kuf, lower=True)
    err = Y - _mean(config, params, X)
    B = jnp.eye(M, dtype=dtype) + (A @ A.T) / noise
    LB = _chol(B)
    Sigma = jax.scipy.linalg.cho_solve((LB, True),
                                       jnp.eye(M, dtype=dtype))
    Sigma = 0.5 * (Sigma + Sigma.T)
    q_mu = Sigma @ (A @ err) / noise
    q_sqrt = _chol(
        Sigma + 1e-12 * jnp.eye(M, dtype=dtype)
    )
    return q_mu, q_sqrt


# ---------------------------------------------------------------------------
# prediction
# ---------------------------------------------------------------------------


def predict_f(config: SVGPConfig, params, Xnew, full_cov: bool = False,
              component_mask=None, coded=None, factor_mask=None):
    """Latent posterior at Xnew (BaseGP.predict_f, model_classes.py:526-534).
    Inputs are cast to the parameter dtype (``__init__.py:10-24`` predict-cast
    patch)."""
    Xnew = jnp.asarray(Xnew, dtype=params["z"].dtype)
    return _conditional(config, params, Xnew, component_mask, coded,
                        full_cov=full_cov, factor_mask=factor_mask)


def predict_y(config: SVGPConfig, params, Xnew, component_mask=None,
              coded=None, factor_mask=None):
    """Observation-space posterior moments (predict_y)."""
    fmean, fvar = predict_f(config, params, Xnew,
                            component_mask=component_mask, coded=coded,
                            factor_mask=factor_mask)
    lik_p = config.likelihood.constrain(params["lik_raw"])
    ymu, yvar = config.likelihood.predict_mean_and_var(
        lik_p, fmean[:, 0], fvar[:, 0]
    )
    return ymu[:, None], yvar[:, None]


def predict_log_density(config: SVGPConfig, params, Xnew, Ynew,
                        component_mask=None, coded=None, factor_mask=None):
    fmean, fvar = predict_f(config, params, Xnew,
                            component_mask=component_mask, coded=coded,
                            factor_mask=factor_mask)
    lik_p = config.likelihood.constrain(params["lik_raw"])
    return config.likelihood.predict_log_density(
        lik_p, fmean[:, 0], fvar[:, 0], jnp.asarray(Ynew)[:, 0]
    )


def predict_f_samples(config: SVGPConfig, params, Xnew, num_samples: int,
                      key: jax.Array, component_mask=None, coded=None,
                      factor_mask=None):
    """Posterior function samples (utilities.py:822-834)."""
    fmean, fcov = predict_f(config, params, Xnew, full_cov=True,
                            component_mask=component_mask, coded=coded,
                            factor_mask=factor_mask)
    jitter = default_jitter()
    Lc = _chol(
        fcov + jitter * jnp.eye(fcov.shape[0], dtype=fcov.dtype)
    )
    eps = jax.random.normal(key, (fcov.shape[0], num_samples),
                            dtype=fcov.dtype)
    return fmean + Lc @ eps  # (N, num_samples)


# ---------------------------------------------------------------------------
# misc parity helpers
# ---------------------------------------------------------------------------


def model_component_variances(config: SVGPConfig, params):
    return component_variances(config.spec, params["kernel_raw"])


def randomize_params(config: SVGPConfig, params, key, loc=0.0, scale=1.0):
    """Random-restart initialisation (BaseGP.randomize_params,
    model_classes.py:181-234): sample unconstrained values from
    Normal(loc, scale); q_sqrt gets an Exponential(scale) diagonal."""
    masks = train_mask(config, params)
    keys = jax.random.split(key, 8)
    new = dict(params)
    for i, name in enumerate(["kernel_raw", "mean_c", "lik_raw", "q_mu"]):
        noise = loc + scale * jax.random.normal(
            keys[i], params[name].shape, dtype=params[name].dtype
        )
        new[name] = jnp.where(masks[name], noise, params[name])
    M = config.num_inducing
    diag = jax.random.exponential(keys[5], (M,),
                                  dtype=params["q_sqrt_raw"].dtype) * scale
    new["q_sqrt_raw"] = jnp.diag(diag)
    return new
