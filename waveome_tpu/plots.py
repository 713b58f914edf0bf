"""Plotting layer (host-side matplotlib/seaborn).

Re-provides the reference's interpretation figures:
  * ``pred_kernel_parts`` (predictions.py:25-479) — grid of additive
    component posteriors: categorical components plot per-level curves,
    continuous×continuous interactions plot 5-number-summary slices, plain
    components get mean + CI + posterior samples; final panel is residuals.
  * ``plot_residuals`` (predictions.py:482-516).
  * ``gp_predict_fun`` (predictions.py:519-729) — marginal posterior along
    one axis, optionally per-unit conditional curves.
  * ``plot_heatmap`` (model_search.py:1271-1443) — outcomes × component
    importance heatmap with cutoffs and clustering.
  * ``plot_feature_metrics`` (model_search.py:1512-1596).
  * ``plot_latent_processes`` / ``plot_multioutput_predictions``
    (model_search.py:1717-2236) for the LMC path.
"""

from __future__ import annotations

import os
import re
from typing import Optional, Sequence

import numpy as np

import matplotlib

# headless default WITHOUT clobbering notebook backends: forcing Agg
# here used to silently kill inline rendering for every figure drawn
# after `import waveome_tpu` in a Jupyter session
if ("inline" not in matplotlib.get_backend().lower()
        and not os.environ.get("DISPLAY")):
    matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import seaborn as sns  # noqa: E402

from .utilities import replace_kernel_variables  # noqa: E402


def _grid_X(X, x_idx, n=300):
    x_new = np.zeros((n, X.shape[1]))
    x_new[:, x_idx] = np.linspace(X[:, x_idx].min(), X[:, x_idx].max(), n)
    return x_new


def _cond_mean(model, F):
    lik = model.config.likelihood
    lik_p = lik.constrain(model.params["lik_raw"])
    return np.asarray(lik.conditional_mean(lik_p, F))


def _component_prediction(model, comp_pos, x_new):
    """Posterior of one active component (marginal mode)."""
    import jax.numpy as jnp

    from .interpret.components import component_posterior_marginal

    idx = model.active_components[comp_pos]
    mask = jnp.asarray(model.component_mask)
    kw = {}
    if model.coded is None:
        kw["factor_mask"] = jnp.asarray(model.factor_mask)
    else:
        kw["coded"] = model.coded
    mu, var, samples, _ = component_posterior_marginal(
        model.config, model.params, jnp.asarray(x_new), idx,
        component_mask=mask, num_samples=30, **kw,
    )
    return (np.asarray(mu)[:, 0], np.asarray(var)[:, 0],
            np.asarray(samples))


def _identity_x(dim, values):
    return values


def _identity_y(values):
    return values


def pred_kernel_parts(
    model,
    data,
    x_idx: int,
    col_names: Sequence[str],
    categorical_dict: Optional[dict] = None,
    num_cols_in_fig: int = 4,
    figsize=None,
    conf_level_val: float = 1.96,
    unit_idx: Optional[int] = None,
    resid_type: str = "pearson",
    cat_color_pal=None,
    x_transform=None,
    y_transform=None,
    **kwargs,
):
    """Figure grid of additive component posteriors + residual panel.

    Unknown keyword arguments are accepted with a warning — the
    reference's ``pred_kernel_parts`` swallows them silently via
    ``**kwargs`` (predictions.py:25-43; e.g. the Sleeve notebook passes
    ``unit_label``, which only ``gp_predict_fun`` consumes), so
    notebook-portability requires accepting them, but silence hides
    typos.

    ``x_transform(dim, values)`` / ``y_transform(values)`` undo the
    standardization for display so axes read in original units (the
    reference reverse-transforms inside GPSearch.plot_parts,
    model_search.py:1445-1510).
    """
    if kwargs:
        import warnings

        warnings.warn(
            f"pred_kernel_parts: ignoring unsupported plot option(s) "
            f"{sorted(kwargs)} (the reference accepts-and-ignores these "
            f"too, predictions.py:43)", stacklevel=2)
    categorical_dict = categorical_dict or {}
    x_transform = x_transform or _identity_x
    y_transform = y_transform or _identity_y
    cat_color_pal = cat_color_pal or sns.color_palette("Set1")
    X, Y = np.asarray(data[0]), np.asarray(data[1])

    comp_names = [
        name for i, name in enumerate(_active_component_names(model))
    ]
    var_percent = model.feature_importances

    if not comp_names:  # constant/empty model → residuals only
        fig, ax = plt.subplots(ncols=1, figsize=(5, 5))
        _residual_panel(model, data, ax, resid_type, unit_idx)
        return fig, ax

    num_figs = len(comp_names) + 1
    num_rows = int(np.ceil(num_figs / num_cols_in_fig))
    if figsize is None:
        figsize = (7.2, 2.0 * num_rows)
    fig, axes = plt.subplots(ncols=num_cols_in_fig, nrows=num_rows,
                             figsize=figsize, squeeze=False)

    for pos, k_name in enumerate(comp_names):
        ax = axes[pos // num_cols_in_fig, pos % num_cols_in_fig]
        dims = [int(d) for d in re.findall(r"\[(\d+)\]", k_name)]
        cat_dims = [int(d) for d in
                    re.findall(r"categorical\[(\d+)\]", k_name)]

        if cat_dims:
            # categorical (possibly × continuous): per-level curves
            cont_dims = [d for d in dims if d not in cat_dims]
            plot_dim = cont_dims[0] if cont_dims else x_idx
            x_new = _grid_X(X, plot_dim)
            cat_dim = cat_dims[0]
            levels = np.unique(X[:, cat_dim])
            for lv in levels:
                x_new[:, cat_dim] = lv
                mu, var, _ = _component_prediction(model, pos, x_new)
                mean_resp = y_transform(_cond_mean(model, mu))
                lo = y_transform(_cond_mean(
                    model, mu - conf_level_val * np.sqrt(var)))
                hi = y_transform(_cond_mean(
                    model, mu + conf_level_val * np.sqrt(var)))
                x_plot = x_transform(plot_dim, x_new[:, plot_dim])
                label = None
                if len(levels) <= 5:
                    cname = col_names[cat_dim]
                    if cname in categorical_dict:
                        label = str(categorical_dict[cname][1][int(lv)])
                    else:
                        label = str(lv)
                    ax.fill_between(x_plot, lo, hi,
                                    color="lightgreen", alpha=0.5)
                ax.plot(x_plot, mean_resp, alpha=0.6,
                        label=label,
                        color=cat_color_pal[int(lv) % len(cat_color_pal)])
            if len(levels) <= 5:
                ax.legend(loc="upper right", fontsize=6)
            xlabel = col_names[plot_dim]
        elif len(set(dims)) == 2:
            # continuous × continuous: 5-number-summary slices
            # (predictions.py:259-336)
            d_main, d_slice = dims[0], dims[1]
            qs = np.quantile(X[:, d_slice], [0, 0.25, 0.5, 0.75, 1.0])
            x_new = _grid_X(X, d_main)
            for q in qs:
                x_new[:, d_slice] = q
                mu, var, _ = _component_prediction(model, pos, x_new)
                q_disp = float(np.asarray(
                    x_transform(d_slice, np.array([q]))
                )[0])
                ax.plot(x_transform(d_main, x_new[:, d_main]),
                        y_transform(_cond_mean(model, mu)),
                        alpha=0.6,
                        label=f"{col_names[d_slice]}={q_disp:.2g}")
            ax.legend(fontsize=5)
            xlabel = col_names[d_main]
        else:
            # plain continuous component: mean + CI + samples
            # (predictions.py:339-434)
            d_main = dims[0] if dims else x_idx
            x_new = _grid_X(X, d_main)
            mu, var, samples = _component_prediction(model, pos, x_new)
            x_plot = x_transform(d_main, x_new[:, d_main])
            for s in range(min(samples.shape[1], 20)):
                ax.plot(x_plot,
                        y_transform(_cond_mean(model, samples[:, s])),
                        color="gray", alpha=0.15, linewidth=0.5)
            ax.plot(x_plot, y_transform(_cond_mean(model, mu)), color="C0")
            ax.fill_between(
                x_plot,
                y_transform(_cond_mean(
                    model, mu - conf_level_val * np.sqrt(var))),
                y_transform(_cond_mean(
                    model, mu + conf_level_val * np.sqrt(var))),
                color="lightgreen", alpha=0.5,
            )
            xlabel = col_names[d_main]

        title = replace_kernel_variables(k_name, list(col_names))
        imp = var_percent[pos] if pos < len(var_percent) else 0.0
        ax.set_title(f"{title}\n(importance {imp:.1f})", fontsize=6)
        ax.set_xlabel(xlabel, fontsize=6)
        ax.tick_params(labelsize=5)

    # residual panel last (predictions.py:457-465)
    ax = axes[(num_figs - 1) // num_cols_in_fig,
              (num_figs - 1) % num_cols_in_fig]
    _residual_panel(model, data, ax, resid_type, unit_idx)
    # hide unused axes
    for k in range(num_figs, num_rows * num_cols_in_fig):
        axes[k // num_cols_in_fig, k % num_cols_in_fig].axis("off")
    fig.tight_layout()
    return fig, axes


def _active_component_names(model):
    spec = model.config.spec.padded()
    names = []
    for i in model.active_components:
        comp = spec.components[i]
        facs = [p.name for j, p in enumerate(comp)
                if p.op != "empty" and model.factor_mask[i, j] > 0]
        names.append("*".join(sorted(facs)))
    return names


def _residual_panel(model, data, ax, resid_type, unit_idx):
    from .interpret.metrics import calc_residuals

    import jax.numpy as jnp

    X, Y = np.asarray(data[0]), np.asarray(data[1])
    fmu, _ = model.predict_f(X)
    lik = model.config.likelihood
    lik_p = lik.constrain(model.params["lik_raw"])
    resids = np.asarray(calc_residuals(
        lik, lik_p, jnp.asarray(Y), jnp.asarray(fmu),
        resid_type=resid_type,
    ))
    fitted = np.asarray(lik.conditional_mean(
        lik_p, jnp.asarray(fmu).reshape(-1)
    ))
    if unit_idx is not None:
        colors = X[:, unit_idx]
        ax.scatter(fitted, resids, c=colors, cmap="tab20", s=6, alpha=0.7)
    else:
        ax.scatter(fitted, resids, s=6, alpha=0.7)
    ax.axhline(0.0, color="k", linewidth=0.5)
    res_share = model.feature_importances[-1] * 100
    ax.set_title(f"residual ({res_share:.0f}%)", fontsize=6)
    ax.set_xlabel("fitted", fontsize=6)
    ax.tick_params(labelsize=5)


def plot_residuals(model, data, resid_type: str = "pearson",
                   unit_idx: Optional[int] = None, figsize=(5, 4)):
    """Fitted-vs-residual scatter (predictions.py:482-516)."""
    fig, ax = plt.subplots(figsize=figsize)
    _residual_panel(model, data, ax, resid_type, unit_idx)
    return fig, ax


def gp_predict_fun(
    model,
    x_idx: int,
    X,
    Y,
    col_names: Sequence[str],
    unit_idx: Optional[int] = None,
    unit_label=None,
    num_funs: int = 10,
    ref_quantile: float = 0.5,
    predict_type: str = "mean",
    conf_level_val: float = 1.96,
    figsize=(6, 4),
    x_transform=None,
    y_transform=None,
    plot_all_units: bool = False,
    random_seed: int = 0,
    n_grid: int = 300,
    ax=None,
    plot_points: bool = True,
):
    """Marginal posterior along one axis at reference quantiles
    (predictions.py:519-729): other covariates pinned at their
    ``ref_quantile``; optional unit-conditional curve. ``x_transform``/
    ``y_transform`` undo standardization for display
    (model_search.py:1598-1675).

    Parity with the reference's three prediction modes
    (predictions.py:561-700):
      - ``predict_type="mean"``: latent CI pushed through the likelihood
        conditional mean;
      - ``predict_type="obs"``: observation-scale CI from predict_y
        moments (mean ± z·√var_y);
      - ``predict_type="func"``: latent mean/CI directly.
    ``num_funs`` posterior function samples are drawn from the full-cov
    latent posterior and overlaid (predictions.py:614-640).
    ``plot_all_units`` overlays one thin conditional mean curve per unit
    (the reference's all-units mode); ``unit_label`` conditions the whole
    plot on one unit.
    """
    x_transform = x_transform or _identity_x
    y_transform = y_transform or _identity_y
    X = np.asarray(X)
    Y = np.asarray(Y)
    x_new = np.zeros((n_grid, X.shape[1]))
    for d in range(X.shape[1]):
        x_new[:, d] = np.quantile(X[:, d], ref_quantile)
    x_new[:, x_idx] = np.linspace(X[:, x_idx].min(), X[:, x_idx].max(),
                                  n_grid)
    if unit_idx is not None and unit_label is not None:
        x_new[:, unit_idx] = unit_label

    fmu, fvar = model.predict_f(x_new)
    fmu = np.asarray(fmu)[:, 0]
    fvar = np.asarray(fvar)[:, 0]

    if ax is None:
        fig, ax = plt.subplots(figsize=figsize)
    else:  # draw into a caller-provided axes (reference predictions.py:528)
        fig = ax.figure
    if predict_type == "func":
        mean, lo, hi = (fmu, fmu - conf_level_val * np.sqrt(fvar),
                        fmu + conf_level_val * np.sqrt(fvar))
    elif predict_type == "obs":
        ymu, yvar = model.predict_y(x_new)
        ymu = np.asarray(ymu)[:, 0]
        sd = np.sqrt(np.asarray(yvar)[:, 0])
        mean, lo, hi = ymu, ymu - conf_level_val * sd, ymu + conf_level_val * sd
    else:
        mean = _cond_mean(model, fmu)
        lo = _cond_mean(model, fmu - conf_level_val * np.sqrt(fvar))
        hi = _cond_mean(model, fmu + conf_level_val * np.sqrt(fvar))
    x_plot = x_transform(x_idx, x_new[:, x_idx])

    # posterior function samples (predictions.py:614-640)
    if num_funs and num_funs > 0:
        _, fcov = model.predict_f(x_new, full_cov=True)
        fcov = np.asarray(fcov)
        if fcov.ndim == 3:
            fcov = fcov[0]
        # eigh-based sampling: the posterior over a dense grid is often
        # numerically rank-deficient (smooth kernels), so Cholesky fails
        # at any reasonable jitter — clamp the spectrum instead
        w, U = np.linalg.eigh((fcov + fcov.T) / 2.0)
        root = U * np.sqrt(np.clip(w, 0.0, None))[None, :]
        rng = np.random.default_rng(random_seed)
        draws = fmu[None, :] + rng.standard_normal(
            (num_funs, n_grid)) @ root.T
        if predict_type != "func":
            draws = np.stack([_cond_mean(model, d) for d in draws])
        for d in draws:
            ax.plot(x_plot, y_transform(d), color="C0", alpha=0.25,
                    linewidth=0.7)

    # per-unit conditional curve family (the reference's all-units mode)
    if plot_all_units and unit_idx is not None:
        units = np.unique(X[:, unit_idx])
        cmap = plt.get_cmap("tab20")
        for i, u in enumerate(units):
            xu = x_new.copy()
            xu[:, unit_idx] = u
            fu, _ = model.predict_f(xu)
            fu = np.asarray(fu)[:, 0]
            cu = fu if predict_type == "func" else _cond_mean(model, fu)
            ax.plot(x_plot, y_transform(cu), color=cmap(i % 20),
                    alpha=0.5, linewidth=0.8)

    ax.plot(x_plot, y_transform(mean), color="C0")
    ax.fill_between(x_plot, y_transform(lo), y_transform(hi),
                    color="lightblue", alpha=0.5)
    if plot_points:
        # unit-conditional plots scatter only that unit's observations
        # (predictions.py:647)
        if unit_idx is not None and unit_label is not None:
            keep = X[:, unit_idx] == unit_label
        else:
            keep = np.ones(X.shape[0], dtype=bool)
        ax.scatter(x_transform(x_idx, X[keep, x_idx]),
                   y_transform(Y[keep, 0]), s=8, color="k", alpha=0.4)
    ax.set_xlabel(col_names[x_idx])
    return fig, ax


def plot_heatmap(
    importance_df,
    var_cutoff: float = 0.8,
    metric_cutoff: Optional[float] = None,
    feature_name: Optional[str] = None,
    show_vals: bool = True,
    figsize=None,
    cluster: bool = True,
    print_drop_count: bool = False,
    cmap: str = "Greens",
    **clustermap_kwargs,
):
    """Kernel-features × outcomes importance heatmap with the reference's
    filtering semantics (model_search.py:1271-1443):

    * ``var_cutoff`` drops OUTCOMES whose total explained share
      ``1 - residual`` is below the cutoff (:1339-1341);
    * ``metric_cutoff`` additionally requires the outcome's best
      component importance to reach the cutoff (:1344-1347) — the right
      knob for unbounded scales like log Bayes factors;
    * ``feature_name`` keeps only outcomes whose model uses the feature,
      displaying just that feature's components (:1299-1333);
    * the grid is transposed (features on rows, outcomes on columns),
      clustered both ways when ``cluster``, with zero cells un-annotated
      (:1373-1440).
    """
    import pandas as pd

    n_feature_drops = 0
    n_explained_drops = 0
    have_resid = "residual" in importance_df.columns
    comp_cols = [c for c in importance_df.columns if c != "residual"]
    if feature_name is not None:
        feature_cols = [
            c for c in comp_cols
            if feature_name in re.findall(r"\[([^\]]+)\]", c)
        ]
    rows = {}
    for out_name, row in importance_df.iterrows():
        cols = comp_cols
        if feature_name is not None:
            cols = [c for c in feature_cols if row[c] != 0.0]
            if not cols:
                n_feature_drops += 1
                continue
        if have_resid and 1.0 - float(row["residual"]) < var_cutoff:
            n_explained_drops += 1
            continue
        vals = {c: float(row[c]) for c in cols if row[c] != 0.0}
        if metric_cutoff is not None:
            if not vals or max(vals.values()) < metric_cutoff:
                n_explained_drops += 1
                continue
        rows[out_name] = vals
    if print_drop_count:
        if feature_name is not None:
            print(f"Number of models dropped because feature not present: "
                  f"{n_feature_drops}")
        print(f"Number of models dropped because of explained threshold "
              f"not met: {n_explained_drops}")
    out_info = pd.DataFrame(rows).T.fillna(0.0)

    if cluster:
        assert len(out_info.index) > 1, (
            "Not enough models meet criteria (clustermap) requested!"
            f"  (N={len(out_info.index)})"
        )
    else:
        assert len(out_info.index) > 0, (
            "Not enough models meet criteria (heatmap) requested!"
            f" (N={len(out_info.index)})"
        )
    if figsize is None:
        # reference's content-scaled sizing (:1389-1400), loosened so a
        # handful of outcomes still renders readably
        width = max(0.25 * out_info.shape[0], 4.0)
        width += 0.06 * max(map(len, map(str, out_info.index)))
        height = max(0.3 * out_info.shape[1], 2.0)
        height += 0.06 * max(map(len, map(str, out_info.columns)))
        figsize = (width, height)
    clustermap_kwargs.setdefault("dendrogram_ratio", (0.05, 0.05))
    if "cbar_pos" not in clustermap_kwargs:
        clustermap_kwargs["cbar_pos"] = (0.5, 0.05, 0.2, 0.03)
        clustermap_kwargs["cbar_kws"] = {
            "orientation": "horizontal",
            "use_gridspec": False,
            "label": "Feature importance",
        }
    # a 1-entry axis has an empty pairwise-distance matrix, which
    # scipy's linkage rejects — cluster each axis only when it can be
    clm = sns.clustermap(
        out_info.transpose(),
        figsize=figsize,
        annot=show_vals,
        annot_kws={"size": 6},
        robust=True,
        cmap=cmap,
        fmt="g",
        col_cluster=cluster and out_info.shape[0] > 1,
        row_cluster=cluster and out_info.shape[1] > 1,
        **clustermap_kwargs,
    )
    ax = clm.ax_heatmap
    plt.setp(ax.xaxis.get_majorticklabels(), rotation=90,
             horizontalalignment="center")
    plt.setp(ax.yaxis.get_majorticklabels(), rotation=0,
             horizontalalignment="left")
    if show_vals:
        for t in ax.texts:
            if not float(t.get_text()) > 0:
                t.set_text("")
    ax.set_xlabel("Outcomes", fontweight="bold", fontsize=8)
    ax.set_ylabel("Kernel features", fontweight="bold", fontsize=8)
    ax.get_xaxis().set_tick_params(which="both", labelsize=6)
    ax.get_yaxis().set_tick_params(which="both", labelsize=6)
    return clm


def plot_feature_metrics(importance_df, feature_name: str,
                         print_drop_count: bool = False,
                         return_df: bool = False,
                         top_n: Optional[int] = None,
                         min_total_explained: float = 0.8,
                         figsize=(6, 4)):
    """Ranked bar chart of one feature's importance across outcomes
    (model_search.py:1512-1596, reference semantics):

    * an outcome contributes the MAX importance among the additive
      components that involve ``feature_name`` (bracket match on the
      component name, as the reference matches ``[idx]`` per term);
    * outcomes whose total explained share ``1 - residual`` is below
      ``min_total_explained`` are dropped (model_search.py:1536), as are
      outcomes whose selected model does not use the feature;
    * ``top_n`` truncates after the descending sort; ``return_df``
      returns the name/metric frame instead of the figure.
    """
    import pandas as pd

    n_feature_drops = 0
    n_explained_drops = 0
    names, values = [], []
    feature_cols = [
        c for c in importance_df.columns
        if feature_name in re.findall(r"\[([^\]]+)\]", c)
    ]
    for out_name, row in importance_df.iterrows():
        if "residual" in importance_df.columns:
            if 1.0 - float(row["residual"]) < min_total_explained:
                n_explained_drops += 1
                continue
        active = [c for c in feature_cols if row[c] != 0.0]
        if not active:
            n_feature_drops += 1
            continue
        names.append(out_name)
        values.append(float(max(row[c] for c in active)))
    if print_drop_count:
        print(f"Number of models dropped because feature not present: "
              f"{n_feature_drops}")
        print(f"Number of models dropped because of explained threshold "
              f"not met: {n_explained_drops}")
    metric_df = pd.DataFrame({"name": names, "metric": values}).sort_values(
        "metric", ascending=False)
    if top_n is not None:
        metric_df = metric_df.head(top_n)
    if return_df:
        return metric_df
    fig, ax = plt.subplots(figsize=figsize)
    if not metric_df.empty:
        sns.barplot(data=metric_df, y="name", x="metric", ax=ax)
    ax.set_xlabel(f"importance of {feature_name}")
    fig.tight_layout()
    return fig, ax


def plot_latent_processes(result, X, x_idx: int = 0, figsize=None):
    """LMC latent posterior curves + mixing-weight bars
    (model_search.py:1717-2064)."""
    from .models.lmc import latent_conditionals, lmc_coded

    import jax.numpy as jnp

    config, params = result.config, result.params
    Q = config.num_latents
    X = np.asarray(X)
    x_new = _grid_X(X, x_idx)
    mu, var = latent_conditionals(
        config, params, lmc_coded(config), jnp.asarray(x_new),
        latent_mask=result.latent_mask,
    )
    mu, var = np.asarray(mu), np.asarray(var)
    W = np.asarray(params["W"])

    if figsize is None:
        figsize = (8, 2 * Q)
    fig, axes = plt.subplots(nrows=Q, ncols=2, figsize=figsize,
                             squeeze=False)
    for q in range(Q):
        ax = axes[q, 0]
        ax.plot(x_new[:, x_idx], mu[:, q], color="C0")
        ax.fill_between(
            x_new[:, x_idx],
            mu[:, q] - 1.96 * np.sqrt(var[:, q]),
            mu[:, q] + 1.96 * np.sqrt(var[:, q]),
            alpha=0.4, color="lightblue",
        )
        name = (result.latent_names[q]
                if q < len(result.latent_names) else f"latent {q}")
        ax.set_title(f"latent {q}: {name}", fontsize=7)
        axw = axes[q, 1]
        axw.bar(np.arange(W.shape[0]), W[:, q])
        axw.set_title("mixing weights", fontsize=7)
    fig.tight_layout()
    return fig, axes


def plot_multioutput_predictions(result, X, Y, x_idx: int = 0,
                                 out_names: Optional[Sequence[str]] = None,
                                 num_cols: int = 3, figsize=None):
    """Per-output predicted trajectories (model_search.py:2066-2236)."""
    from .models.lmc import lmc_predict_y

    X, Y = np.asarray(X), np.asarray(Y)
    P = Y.shape[1]
    x_new = _grid_X(X, x_idx)
    ymu, yvar = lmc_predict_y(result.config, result.params, x_new,
                              latent_mask=result.latent_mask)
    ymu, yvar = np.asarray(ymu), np.asarray(yvar)
    rows = int(np.ceil(P / num_cols))
    if figsize is None:
        figsize = (3 * num_cols, 2.5 * rows)
    fig, axes = plt.subplots(rows, num_cols, figsize=figsize,
                             squeeze=False)
    for p in range(P):
        ax = axes[p // num_cols, p % num_cols]
        ax.scatter(X[:, x_idx], Y[:, p], s=6, alpha=0.4, color="k")
        ax.plot(x_new[:, x_idx], ymu[:, p], color="C0")
        ax.fill_between(
            x_new[:, x_idx],
            ymu[:, p] - 1.96 * np.sqrt(yvar[:, p]),
            ymu[:, p] + 1.96 * np.sqrt(yvar[:, p]),
            alpha=0.4, color="lightblue",
        )
        title = out_names[p] if out_names else f"output {p}"
        ax.set_title(title, fontsize=7)
    for k in range(P, rows * num_cols):
        axes[k // num_cols, k % num_cols].axis("off")
    fig.tight_layout()
    return fig, axes
