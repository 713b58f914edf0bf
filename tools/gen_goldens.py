"""Generate golden NLL/ELBO parity values (tests/goldens/gpflow_golden.json).

GPflow itself is not installable in this image, so the goldens are produced
by THIS file: a fully independent float64 numpy/scipy implementation of the
exact equations GPflow evaluates (whitened SVGP ELBO per Hensman et al.,
exact GPR log marginal likelihood, Titsias collapsed bound, 20-point
Gauss-Hermite variational expectations — GPflow's default quadrature — and
the TFP Horseshoe log-prob formula the reference applies as a prior,
model_classes.py:857-864). It deliberately imports NOTHING from
waveome_tpu: different code, same math, so agreement to 1e-6 is evidence of
correctness, not self-comparison. Every formula cites the reference usage
it must match.

Run:  python tools/gen_goldens.py        # rewrites tests/goldens/*.json
"""

import json
import math
import os

import numpy as np
from scipy.special import gammaln, log_ndtr, ndtr, roots_hermite
from scipy.stats import multivariate_normal

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "goldens", "gpflow_golden.json")

JITTER = 1e-6  # gpflow default_jitter, matched by waveome_tpu.config

# ---------------------------------------------------------------------------
# fixed dataset (small, deterministic)
# ---------------------------------------------------------------------------


def make_data():
    rng = np.random.RandomState(7)
    n_units, n_per = 6, 4
    ids = np.repeat(np.arange(n_units), n_per).astype(np.float64)
    t = np.tile(np.linspace(-1.5, 1.5, n_per), n_units)
    female = np.repeat((np.arange(n_units) % 2).astype(np.float64), n_per)
    X = np.column_stack([ids, t, female])  # (24, 3)
    y_cont = np.sin(1.3 * t) + 0.3 * female + 0.2 * rng.randn(len(t))
    y_count = rng.poisson(np.exp(0.5 + 0.8 * np.sin(t))).astype(np.float64)
    y_bin = (y_cont > 0).astype(np.float64)
    y_pos = np.exp(y_cont) + 0.1
    return X, y_cont, y_count, y_bin, y_pos


# ---------------------------------------------------------------------------
# kernel grams (independent implementations; gpflow/waveome semantics)
# ---------------------------------------------------------------------------


def k_cat(x1, x2, var):
    """waveome Categorical (kernels.py:95-117): var * 1[round==round]."""
    return var * (np.round(x1)[:, None] == np.round(x2)[None, :]).astype(
        np.float64)


def k_se(x1, x2, var, ls):
    d2 = (x1[:, None] - x2[None, :]) ** 2
    return var * np.exp(-0.5 * d2 / ls ** 2)


def k_m12(x1, x2, var, ls):
    d = np.abs(x1[:, None] - x2[None, :])
    return var * np.exp(-d / ls)


def k_periodic(x1, x2, var, ls, period):
    s = np.sin(math.pi * (x1[:, None] - x2[None, :]) / period) / ls
    return var * np.exp(-2.0 * s * s)


# the shared test kernel:
#   v0*Cat(x0) + v1*SE(x1) + v2*Cat(x2)*Matern12(x1) + v3*Periodic(x1)
THETA = dict(
    v0=0.7, v1=1.3, ls1=0.9, v2=0.5, ls2=1.7, v3=0.4, ls3=1.1, period=2.3,
    mean_c=0.3, noise=0.25,
)


def K_full(X1, X2, th=THETA):
    return (
        k_cat(X1[:, 0], X2[:, 0], th["v0"])
        + k_se(X1[:, 1], X2[:, 1], th["v1"], th["ls1"])
        + k_cat(X1[:, 2], X2[:, 2], th["v2"])
        * k_m12(X1[:, 1], X2[:, 1], 1.0, th["ls2"])
        + k_periodic(X1[:, 1], X2[:, 1], th["v3"], th["ls3"], th["period"])
    )


# ---------------------------------------------------------------------------
# likelihood log-probs / variational expectations (gpflow semantics)
# ---------------------------------------------------------------------------

_GH_X, _GH_W = roots_hermite(20)  # gpflow default num_gauss_hermite_points


def gh_expect(log_fn, fmu, fvar):
    """E_{N(f|fmu,fvar)}[log_fn(f)] by 20-pt Gauss-Hermite (per element)."""
    f = fmu[:, None] + np.sqrt(2.0 * fvar[:, None]) * _GH_X[None, :]
    return np.sum(log_fn(f) * (_GH_W / math.sqrt(math.pi))[None, :], axis=1)


def gh_log_density(log_fn, fmu, fvar):
    from scipy.special import logsumexp

    f = fmu[:, None] + np.sqrt(2.0 * fvar[:, None]) * _GH_X[None, :]
    logw = np.log(_GH_W / math.sqrt(math.pi))
    return logsumexp(log_fn(f) + logw[None, :], axis=1)


def nb_logp(f, y, alpha):
    """reference likelihoods.py:68-79 (mean=exp(f), dispersion alpha)."""
    m = np.exp(f)
    k = 1.0 / alpha
    return (gammaln(k + y) - gammaln(y + 1.0) - gammaln(k)
            + y * np.log(m / (m + k)) - k * np.log1p(m * alpha))


def zinb_logp(f, y, alpha, km):
    """reference likelihoods.py:96-139: psi = 1 - m/(km+m)."""
    m = np.exp(f)
    psi = 1.0 - m / (km + m)
    nb_zero = -np.log1p(m * alpha) / alpha
    lp0 = np.logaddexp(np.log(psi), np.log1p(-psi) + nb_zero)
    lpn = np.log1p(-psi) + nb_logp(f, y, alpha)
    return np.where(y == 0, lp0, lpn)


LIK_PARAMS = dict(
    gaussian=dict(variance=THETA["noise"]),
    poisson=dict(),
    bernoulli=dict(),
    gamma=dict(shape=1.4),
    exponential=dict(),
    negative_binomial=dict(alpha=0.8),
    zeroinflated_negativebinomial=dict(alpha=0.8, km=1.5),
)


def var_exp(name, fmu, fvar, y):
    """gpflow variational_expectations: analytic where gpflow is analytic,
    GH-20 otherwise (gpflow Likelihood default)."""
    p = LIK_PARAMS[name]
    if name == "gaussian":
        s2 = p["variance"]
        return (-0.5 * np.log(2 * math.pi) - 0.5 * np.log(s2)
                - 0.5 * ((y - fmu) ** 2 + fvar) / s2)
    if name == "poisson":
        return y * fmu - np.exp(fmu + fvar / 2) - gammaln(y + 1.0)
    if name == "gamma":
        sh = p["shape"]
        return (-sh * fmu - gammaln(sh) + (sh - 1.0) * np.log(y)
                - y * np.exp(-fmu + fvar / 2))
    if name == "exponential":
        return -fmu - y * np.exp(-fmu + fvar / 2)
    if name == "bernoulli":
        return gh_expect(lambda f: log_ndtr((2 * y[:, None] - 1) * f),
                         fmu, fvar)
    if name == "negative_binomial":
        return gh_expect(lambda f: nb_logp(f, y[:, None], p["alpha"]),
                         fmu, fvar)
    if name == "zeroinflated_negativebinomial":
        return gh_expect(
            lambda f: zinb_logp(f, y[:, None], p["alpha"], p["km"]),
            fmu, fvar)
    raise ValueError(name)


# ---------------------------------------------------------------------------
# model objectives (whitened SVGP / exact GPR / collapsed bound)
# ---------------------------------------------------------------------------


def make_variational(M, seed=11):
    rng = np.random.RandomState(seed)
    q_mu = 0.4 * rng.randn(M, 1)
    A = 0.2 * rng.randn(M, M)
    q_sqrt = np.tril(A)
    np.fill_diagonal(q_sqrt, np.abs(np.diag(A)) + 0.5)
    return q_mu, q_sqrt


def whitened_conditional(X, Z, q_mu, q_sqrt, th=THETA):
    """gpflow whitened SVGP conditional: mean = A^T q_mu + c,
    var = Kdiag - colsum(A^2) + colsum((q_sqrt^T A)^2)."""
    Kuu = K_full(Z, Z, th) + JITTER * np.eye(len(Z))
    L = np.linalg.cholesky(Kuu)
    Kuf = K_full(Z, X, th)
    A = np.linalg.solve(L, Kuf)
    Kdiag = np.diag(K_full(X, X, th)).copy()
    fmean = A.T @ q_mu + th["mean_c"]
    SA = q_sqrt.T @ A
    fvar = Kdiag - np.sum(A * A, axis=0) + np.sum(SA * SA, axis=0)
    return fmean[:, 0], fvar


def kl_whitened(q_mu, q_sqrt):
    M = q_mu.shape[0]
    return 0.5 * (np.sum(q_mu ** 2) + np.sum(q_sqrt ** 2) - M
                  - 2.0 * np.sum(np.log(np.abs(np.diag(q_sqrt)))))


def svgp_elbo(name, X, Z, y, q_mu, q_sqrt, th=THETA):
    fmu, fvar = whitened_conditional(X, Z, q_mu, q_sqrt, th)
    return float(np.sum(var_exp(name, fmu, fvar, y))
                 - kl_whitened(q_mu, q_sqrt))


def exact_gpr_mll(X, y, th=THETA):
    """N(y; c, K + noise I) — gpflow GPR.log_marginal_likelihood;
    reference exact path model_types_DEPR.py:49-62 (penalty 0)."""
    Ky = K_full(X, X, th) + th["noise"] * np.eye(len(X))
    return float(multivariate_normal.logpdf(y, mean=np.full(len(y),
                 th["mean_c"]), cov=Ky))


def collapsed_bound(X, Z, y, th=THETA):
    """Titsias bound: log N(y; c, Qnn + noise I) - tr(Knn - Qnn)/(2 noise);
    gpflow SGPR.elbo semantics (dense f64 evaluation)."""
    Kuu = K_full(Z, Z, th) + JITTER * np.eye(len(Z))
    Kuf = K_full(Z, X, th)
    Qnn = Kuf.T @ np.linalg.solve(Kuu, Kuf)
    noise = th["noise"]
    cov = Qnn + noise * np.eye(len(X))
    logN = multivariate_normal.logpdf(y, mean=np.full(len(y), th["mean_c"]),
                                      cov=cov)
    Kdiag = np.diag(K_full(X, X, th))
    trace_term = (np.sum(Kdiag) - np.trace(Qnn)) / (2.0 * noise)
    return float(logN - trace_term)


def predict_log_density(name, X, Z, Xnew, ynew, q_mu, q_sqrt, th=THETA):
    fmu, fvar = whitened_conditional(Xnew, Z, q_mu, q_sqrt, th)
    p = LIK_PARAMS[name]
    if name == "gaussian":
        v = fvar + p["variance"]
        return (-0.5 * (np.log(2 * math.pi) + np.log(v)
                        + (ynew - fmu) ** 2 / v))
    if name == "bernoulli":
        prob = ndtr(fmu / np.sqrt(1.0 + fvar))
        return np.log(np.where(ynew > 0.5, prob, 1.0 - prob))
    if name == "negative_binomial":
        return gh_log_density(lambda f: nb_logp(f, ynew[:, None],
                                                p["alpha"]), fmu, fvar)
    if name == "poisson":
        return gh_log_density(
            lambda f: ynew[:, None] * f - np.exp(f)
            - gammaln(ynew[:, None] + 1.0), fmu, fvar)
    if name == "zeroinflated_negativebinomial":
        return gh_log_density(
            lambda f: zinb_logp(f, ynew[:, None], p["alpha"], p["km"]),
            fmu, fvar)
    raise ValueError(name)


# ---------------------------------------------------------------------------
# TFP Horseshoe log-prob (the formula tfd.Horseshoe evaluates; the reference
# applies it via model_classes.py:857-864). Independent re-derivation from
# the published TFP source formula.
# ---------------------------------------------------------------------------


def horseshoe_log_prob_tfp(x, scale):
    g = math.exp(-0.5772156649015329)  # exp(-euler_gamma)
    b = math.sqrt(2.0 * (1.0 - g) / (g * (2.0 - g)))
    h_inf = (1.0 - g) * (g * g - 6.0 * g + 12.0) / (
        3.0 * g * (2.0 - g) ** 2 * b)
    xx = (x / scale) ** 2 / 2.0
    q = 20.0 / 47.0 * xx ** 1.0919284281983377
    h = 1.0 / (1.0 + xx ** 1.5) + h_inf * q / (1.0 + q)
    c = -0.5 * math.log(2.0 * math.pi ** 3) - math.log(g * scale)
    z = math.log1p(-g) - math.log(g)
    softplus = np.log1p(np.exp(-np.abs(z - xx / (1.0 - g)))) + np.maximum(
        z - xx / (1.0 - g), 0.0)
    return (-softplus
            + np.log(np.log1p(g / xx - (1.0 - g) / (h + b * xx) ** 2)) + c)


# ---------------------------------------------------------------------------


def main():
    X, y_cont, y_count, y_bin, y_pos = make_data()
    M = 8
    Z = X[::3][:M]  # deterministic inducing subset
    q_mu, q_sqrt = make_variational(M)
    Xnew = X[5:15]

    out = {
        "theta": THETA,
        "lik_params": LIK_PARAMS,
        "data": {
            "X": X.tolist(),
            "y_cont": y_cont.tolist(),
            "y_count": y_count.tolist(),
            "y_bin": y_bin.tolist(),
            "y_pos": y_pos.tolist(),
            "Z": Z.tolist(),
            "q_mu": q_mu.tolist(),
            "q_sqrt": q_sqrt.tolist(),
            "jitter": JITTER,
        },
        "exact_gpr_mll": exact_gpr_mll(X, y_cont),
        "collapsed_bound": collapsed_bound(X, Z, y_cont),
        "svgp_elbo": {},
        "predict_log_density": {},
        "horseshoe": {},
        "kl_whitened": kl_whitened(q_mu, q_sqrt),
        "gram_checksums": {
            "K_full_trace": float(np.trace(K_full(X, X))),
            "K_full_sum": float(np.sum(K_full(X, X))),
            "Kuf_sum": float(np.sum(K_full(Z, X))),
        },
    }

    ys = dict(
        gaussian=y_cont, poisson=y_count, bernoulli=y_bin, gamma=y_pos,
        exponential=y_pos, negative_binomial=y_count,
        zeroinflated_negativebinomial=y_count,
    )
    for name, y in ys.items():
        out["svgp_elbo"][name] = svgp_elbo(name, X, Z, y, q_mu, q_sqrt)

    for name in ("gaussian", "bernoulli", "negative_binomial", "poisson",
                 "zeroinflated_negativebinomial"):
        out["predict_log_density"][name] = predict_log_density(
            name, X, Z, Xnew, ys[name][5:15], q_mu, q_sqrt
        ).tolist()

    xs = [0.05, 0.3, 1.0, 2.5, 10.0]
    for s in (0.5, 1.0, 4.0):
        out["horseshoe"][str(s)] = horseshoe_log_prob_tfp(
            np.array(xs), s).tolist()
    out["horseshoe_xs"] = xs

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {OUT}")
    print("exact_gpr_mll:", out["exact_gpr_mll"])
    print("collapsed_bound:", out["collapsed_bound"])
    for k, v in out["svgp_elbo"].items():
        print(f"svgp_elbo[{k}]: {v:.10f}")


if __name__ == "__main__":
    main()
