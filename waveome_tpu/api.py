"""GPSearch — the user-facing orchestration API.

Re-implements the reference's ``GPSearch`` class (model_search.py:47-2236):
pandas ingestion with categorical factorization and standardization, the
penalized-optimization path, the greedy kernel search, multi-output LMC
paths, and the plotting delegates — with per-outcome parallelism as
vmap-batched mesh-sharded XLA fits instead of Ray worker processes.
"""

from __future__ import annotations

import time
import warnings
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from .fit import fit_outcomes_penalized
from .interpret.metrics import calc_bic
from .kernels.build import full_kernel_build
from .kernels.spec import KernelSpec
from .models import svgp
from .utilities import replace_kernel_variables


class FittedGP:
    """Handle on one fitted per-outcome model.

    The functional analogue of the reference's fitted ``PSVGP`` object:
    wraps (config, params, pruning masks, importances) and exposes
    ``predict_f/predict_y/predict_log_density``, ``kernel_name``,
    ``feature_importances`` and ``calc_metric`` (model_classes.py:526-608).
    """

    def __init__(self, config, params, component_mask, factor_mask,
                 importances, penalization_factor, loss,
                 component_names: Sequence[str], coded=None):
        self.config = config
        self.params = params
        self.component_mask = np.asarray(component_mask)
        self.factor_mask = np.asarray(factor_mask)
        self.raw_importances = np.asarray(importances)
        self.penalization_factor = float(penalization_factor)
        self.loss = float(loss)
        self._component_names = list(component_names)
        self.coded = coded  # op-code arrays for coded-structure configs
        self.update_kernel_name()

    # -- naming (BaseGP.update_kernel_name, model_classes.py:171-179) --
    def update_kernel_name(self) -> None:
        spec = self.config.spec.padded()
        names = []
        self.active_components: List[int] = []
        for i, comp in enumerate(spec.components):
            if self.component_mask[i] <= 0:
                continue
            facs = [
                p.name for j, p in enumerate(comp)
                if p.op != "empty" and self.factor_mask[i, j] > 0
            ]
            if not facs:
                continue
            names.append("*".join(sorted(facs)))
            self.active_components.append(i)
        self.kernel_name = "+".join(names) if names else "constant"

    @property
    def feature_importances(self) -> List[float]:
        """Importances for active components + residual share last
        (BaseGP.get_feature_importances, model_classes.py:546-573)."""
        vals = [float(self.raw_importances[i])
                for i in self.active_components]
        vals.append(float(self.raw_importances[-1]))
        return vals

    @property
    def component_importance_dict(self) -> Dict[str, float]:
        spec = self.config.spec.padded()
        out = {}
        for i in self.active_components:
            comp = spec.components[i]
            facs = [p.name for j, p in enumerate(comp)
                    if p.op != "empty" and self.factor_mask[i, j] > 0]
            out["*".join(sorted(facs))] = float(self.raw_importances[i])
        out["residual"] = float(self.raw_importances[-1])
        return out

    # -- prediction --
    def _mask_kwargs(self):
        kw = dict(component_mask=jnp.asarray(self.component_mask))
        if self.coded is not None:
            kw["coded"] = self.coded
        else:
            kw["factor_mask"] = jnp.asarray(self.factor_mask)
        return kw

    def predict_f(self, Xnew, full_cov=False):
        return svgp.predict_f(
            self.config, self.params, jnp.asarray(Xnew), full_cov=full_cov,
            **self._mask_kwargs(),
        )

    def predict_y(self, Xnew):
        return svgp.predict_y(
            self.config, self.params, jnp.asarray(Xnew),
            **self._mask_kwargs(),
        )

    def predict_log_density(self, Xnew, Ynew):
        return svgp.predict_log_density(
            self.config, self.params, jnp.asarray(Xnew), jnp.asarray(Ynew),
            **self._mask_kwargs(),
        )

    def log_posterior_density(self, X, Y):
        return svgp.log_posterior(
            self.config, self.params, jnp.asarray(X), jnp.asarray(Y),
            penalization_factor=self.penalization_factor,
            **self._mask_kwargs(),
        )

    def calc_metric(self, X, Y, metric: str = "BIC"):
        """BIC = 2k − 2·log posterior (model_classes.py:575-582; k counts
        parameter groups as the reference's len(trainable_parameters))."""
        assert metric == "BIC", "Only BIC currently allowed."
        ll = float(self.log_posterior_density(X, Y))
        k = self.num_parameter_groups()
        return calc_bic(ll, X.shape[0], k)

    def num_parameter_groups(self) -> int:
        """Count of scalar parameter *objects* as gpflow would see them."""
        spec = self.config.spec
        k = int(np.asarray(spec.train_mask()).sum())
        k += self.config.likelihood.n_params
        k += 1  # mean constant
        k += 2  # q_mu, q_sqrt
        if self.config.train_inducing:
            k += 1
        return k


def _warn_unknown_kwargs(method: str, compat: dict) -> None:
    """Reference-API kwargs we accept but do not implement: warn instead of
    silently changing behavior for users porting reference scripts."""
    if compat:
        warnings.warn(
            f"GPSearch.{method} ignoring unsupported option(s): "
            f"{sorted(compat)} (accepted for reference-API compatibility, "
            "but they have no effect here)",
            stacklevel=3,
        )


class GPSearch:
    """Automated GP analysis over many outcomes (model_search.py:47-195)."""

    def __init__(
        self,
        X: pd.DataFrame,
        Y: pd.DataFrame,
        unit_col: Optional[str] = None,
        standardize_X: bool = True,
        Y_transform: Optional[str] = None,
        categorical_vars: Optional[List[str]] = None,
        outcome_likelihood: str = "gaussian",
    ):
        categorical_vars = list(categorical_vars or [])
        X = X.copy()

        if not isinstance(X, pd.DataFrame):
            raise TypeError("X is not a Pandas DataFrame")
        if not isinstance(Y, pd.DataFrame):
            raise TypeError("Y is not a Pandas DataFrame")

        # unit col is categorical (model_search.py:92-93)
        if unit_col is not None and unit_col not in categorical_vars:
            categorical_vars.append(unit_col)

        # factorize string categoricals, keep mapping (model_search.py:96-104)
        self.categorical_dict = {}
        for c in categorical_vars:
            if X[c].dtype in ["object", "string", "category"]:
                print(f"Converting {c} to numeric")
                codes, uniques = pd.factorize(X[c])
                self.categorical_dict[c] = (codes, uniques)
                X[c] = codes.astype(float)

        # float casting with guidance (model_search.py:106-127)
        try:
            X = X.astype(float)
        except (TypeError, ValueError):
            bad = [c for c in X.columns
                   if not np.issubdtype(X[c].dtype, np.floating)]
            raise TypeError(
                "X columns must all be float type."
                f" Cast {bad} to float. Perhaps use pandas.factorize()"
                " and pandas.DataFrame.astype()."
            )
        try:
            Y = Y.astype(float)
        except (TypeError, ValueError):
            bad = [c for c in Y.columns
                   if not np.issubdtype(Y[c].dtype, np.floating)]
            raise TypeError(
                "Y columns must all be float type."
                f" Cast {bad} to float."
            )

        # no missing data (model_search.py:129-135)
        assert X.isna().sum().sum() == 0, (
            "NAs in X, waveome cannot currently handle missing values!"
        )
        assert Y.isna().sum().sum() == 0, (
            "NAs in Y, waveome cannot currently handle missing values!"
        )

        self.X = X.copy()
        self.Y = Y.copy()
        self.feat_names = X.columns.tolist()
        self.out_names = Y.columns.tolist()
        self.cat_idx = [self.feat_names.index(x) for x in categorical_vars]
        self.unit_idx = (
            self.feat_names.index(unit_col) if unit_col is not None else None
        )
        self.likelihood = outcome_likelihood
        self.cont_idx = [
            i for i in range(X.shape[1]) if i not in self.cat_idx
        ]

        # standardize continuous X (model_search.py:155-168)
        if standardize_X:
            self.X_means = self.X.iloc[:, self.cont_idx].mean(axis=0)
            self.X_stds = self.X.iloc[:, self.cont_idx].std(axis=0)
            self.X_original = self.X.copy()
            for c in self.cont_idx:
                name = self.feat_names[c]
                self.X[name] = (
                    (self.X[name] - self.X_means[name]) / self.X_stds[name]
                )

        # Y transform (model_search.py:172-191)
        if Y_transform == "standardize":
            if self.likelihood != "gaussian":
                warnings.warn(
                    "Standardizing Y without a gaussian likelihood is"
                    " not advised! Maybe Y_transform='scale' is better?"
                )
            self.Y_means = self.Y.mean(axis=0)
            self.Y_stds = self.Y.std(axis=0)
            self.Y_original = self.Y.copy()
            self.Y = (self.Y - self.Y_means) / self.Y_stds
        elif Y_transform == "scale":
            if self.likelihood in ["binomial", "bernoulli"]:
                warnings.warn(
                    f"Scaling Y with {outcome_likelihood} is not advised!"
                    " Maybe pass as-is with Y_transform=None is better?"
                )
            self.Y_stds = self.Y.std(axis=0)
            self.Y_original = self.Y.copy()
            self.Y = self.Y / self.Y_stds
        self.Y_transform = Y_transform
        self.models: Dict[str, FittedGP] = {}
        self.run_parameters: Dict[str, dict] = {}

    # ------------------------------------------------------------------
    # penalized path (model_search.py:197-517)
    # ------------------------------------------------------------------
    def penalized_optimization(
        self,
        full_kernel: Optional[KernelSpec] = None,
        verbose: bool = False,
        kernel_options: Optional[dict] = None,
        penalization_factor: Optional[float] = 1.0,
        num_factor_iter: int = 5,
        num_restart: int = 0,
        sparse_options: Optional[dict] = None,
        optimization_options: Optional[dict] = None,
        random_seed: Optional[int] = None,
        sweep_options: Optional[dict] = None,
        importance_type: str = "log_bf",
        **_compat,
    ) -> None:
        """Fit every outcome with the horseshoe-penalized saturated kernel.

        ``importance_type``: "log_bf" (reference default), "statistic", or
        "deviance" (calc_feature_importance_components value options,
        utilities.py:614-707). For count likelihoods at large Y the
        log-Bayes-factor scale is astronomical (leave-one-out means sit
        e^Δ away under the exp link); "deviance" is the bounded [0,1]
        per-component share and the right heatmap input there.

        ``penalization_factor=None`` triggers the auto factor + iterative
        re-estimation (model_search.py:273-299).

        ``sweep_options`` routes the batch through the chunked,
        checkpoint/resume sweep driver (fit/sweep.py) instead of one
        monolithic call — the production path for hundreds+ of outcomes
        (the reference's Ray batching + user-level pickling,
        model_search.py:411-512). Keys: ``checkpoint_dir``, ``chunk_size``
        (default 256), ``partition_across_hosts``.
        """
        _warn_unknown_kwargs("penalized_optimization", _compat)
        self.model_selection_type = "penalized"
        self.run_parameters["penalized_optimization"] = {
            "penalization_factor": penalization_factor,
            "num_factor_iter": num_factor_iter,
            "num_restart": num_restart,
            "kernel_options": kernel_options,
            "random_seed": random_seed,
        }
        kernel_options = dict(kernel_options or {})
        sparse_options = dict(sparse_options or {})
        optimization_options = dict(optimization_options or {})

        if full_kernel is None:
            spec, names = full_kernel_build(
                cat_vars=self.cat_idx,
                num_vars=self.cont_idx,
                unit_idx=self.unit_idx,
                var_names=self.feat_names,
                return_sum=True,
                **kernel_options,
            )
        else:
            spec = full_kernel
            names = list(spec.component_names())
        self.full_kernel_names = names

        start = time.time()
        n_out = len(self.out_names)
        print(f"Building {n_out} models...")

        fit_kwargs = dict(
            likelihood=self.likelihood,
            num_inducing_points=sparse_options.get(
                "num_inducing_points", 500
            ),
            penalization_factor=penalization_factor,
            num_factor_iter=num_factor_iter,
            num_restart=num_restart,
            # non-Gaussian fits run the reference's Adam+NatGrad branch,
            # whose iteration budget default is 2000 (model_classes.py:
            # 344-470); the Gaussian collapsed path converges in far
            # fewer L-BFGS iterations
            max_iter=optimization_options.get(
                "num_opt_iter",
                500 if self.likelihood == "gaussian" else 2000,
            ),
            seed=random_seed or 0,
            batch_size=optimization_options.get("batch_size"),
            objective=optimization_options.get("objective", "auto"),
            device_chunk=optimization_options.get("device_chunk", 8),
            importance_type=importance_type,
        )
        comp_names = list(spec.component_names())

        if sweep_options is not None:
            # production path: chunked checkpoint/resume sweep
            from .fit.sweep import run_penalized_sweep
            from .models import svgp as _svgp

            sweep_options = dict(sweep_options)
            X_np = self.X.to_numpy()
            summaries = run_penalized_sweep(
                X_np,
                self.Y.to_numpy(),
                spec,
                out_names=self.out_names,
                checkpoint_dir=sweep_options.get("checkpoint_dir"),
                chunk_size=sweep_options.get("chunk_size", 256),
                partition_across_hosts=sweep_options.get(
                    "partition_across_hosts", True
                ),
                verbose=verbose,
                keep_params=True,
                **fit_kwargs,
            )
            config = svgp.make_config(
                spec, self.likelihood, num_data=X_np.shape[0],
                input_dim=X_np.shape[1],
                num_inducing_points=fit_kwargs["num_inducing_points"],
            )
            for feat, r in summaries.items():
                self.models[feat] = FittedGP(
                    config=config,
                    params=r["params"],
                    component_mask=r["component_mask"],
                    factor_mask=r["factor_mask"],
                    importances=r["importances"],
                    penalization_factor=r["penalization_factor"],
                    loss=r["loss"],
                    component_names=comp_names,
                )
        else:
            batch = fit_outcomes_penalized(
                self.X.to_numpy(), self.Y.to_numpy(), spec, **fit_kwargs,
            )
            self._batch = batch
            for b, feat in enumerate(self.out_names):
                r = batch.for_outcome(b)
                self.models[feat] = FittedGP(
                    config=batch.config,
                    params=r.params,
                    component_mask=r.component_mask,
                    factor_mask=r.factor_mask,
                    importances=r.importances,
                    penalization_factor=r.penalization_factor,
                    loss=r.loss,
                    component_names=comp_names,
                )
            if verbose:
                for feat, m in self.models.items():
                    print(f"  {feat}: {m.kernel_name} "
                          f"(loss={m.loss:.3f})")

        elapsed = np.round((time.time() - start) / 60, 1)
        print(f"Finished {n_out} models (100%), elapsed time: {elapsed} "
              "minutes")

    # ------------------------------------------------------------------
    # greedy search path (model_search.py:1069-1250) — see search/greedy
    # ------------------------------------------------------------------
    def run_search(
        self,
        kernels: Sequence[str] = ("squared_exponential", "matern12",
                                  "linear", "periodic"),
        max_depth: int = 5,
        early_stopping: bool = True,
        prune: bool = True,
        keep_all: bool = False,
        metric_diff: float = 6.0,
        # the reference's run_search default (model_search.py:1082) —
        # full_kernel_search's own default is 5 but run_search overrides
        # it to 1 and every reference application goes through run_search
        num_restart: int = 1,
        softmax_select: bool = False,
        split: bool = False,
        training_percent: float = 0.7,
        num_inducing_points: int = 500,
        max_iter: int = 200,
        random_seed: Optional[int] = None,
        verbose: bool = False,
        sweep_options: Optional[dict] = None,
        warm_start: bool = False,
        mesh=None,
        **_compat,
    ) -> None:
        """Greedy kernel-structure search per outcome
        (model_search.py:1069-1250). ``num_restart`` random restarts per
        candidate fit (kernel_test, model_search.py:2269-2297);
        ``softmax_select`` enables stochastic exploration
        (model_search.py:3535-3627); ``split`` scores candidates on a
        unit-level holdout instead of BIC (split_kernel_search,
        model_search.py:3275-3532).

        ``sweep_options`` routes the search through the chunked,
        checkpoint/resume sweep driver (search/sweep.py) — outcomes
        advance in device-memory-bounded chunks and persist as each chunk
        completes (the reference's Ray batches of 5*num_cpus outcomes
        under a SLURM wall limit, model_search.py:1149-1222, lose
        in-flight work on a crash). Keys: ``checkpoint_dir``,
        ``chunk_size`` (default 64), ``partition_across_hosts``.

        ``warm_start=True`` initializes each expansion candidate's shared
        structure from its parent's fitted optimum (restart 0 runs
        unrandomized; remaining restarts stay random) — a TPU-first
        speedup absent from the reference, whose ``kernel_test`` always
        fits from fresh inits.

        ``mesh``: optional 1-D ``jax.sharding.Mesh`` — candidate batches
        shard over its devices (the multi-chip replacement for the
        reference's Ray search farm; engine.fit_candidates)."""
        from .search.greedy import multi_outcome_kernel_search

        _warn_unknown_kwargs("run_search", _compat)
        self.model_selection_type = "search"
        self.run_parameters["run_search"] = {
            "kernels": list(kernels), "max_depth": max_depth,
            "num_restart": num_restart, "softmax_select": softmax_select,
            "split": split,
        }
        self.search_info = {}
        start = time.time()
        n_out = len(self.out_names)
        print(f"Searching over {n_out} outcomes...")
        # lockstep search: every outcome's candidate batch at each depth
        # fits in one program (replaces per-outcome Ray workers,
        # model_search.py:1149-1222)
        search_kwargs = dict(
            kern_list=list(kernels),
            cat_vars=self.cat_idx,
            max_depth=max_depth,
            early_stopping=early_stopping,
            prune=prune,
            keep_all=keep_all,
            metric_diff=metric_diff,
            num_restart=num_restart,
            softmax_select=softmax_select,
            split=split,
            training_percent=training_percent,
            num_inducing_points=num_inducing_points,
            max_iter=max_iter,
            unit_idx=self.unit_idx,
            lik=self.likelihood,
            random_seed=random_seed,
            verbose=verbose,
            warm_start=warm_start,
            mesh=mesh,
        )
        if sweep_options is not None:
            from .search.sweep import run_search_sweep

            sweep_options = dict(sweep_options)
            results = run_search_sweep(
                X=self.X.to_numpy(),
                Ys=self.Y.to_numpy(),
                out_names=self.out_names,
                checkpoint_dir=sweep_options.get("checkpoint_dir"),
                chunk_size=sweep_options.get("chunk_size", 64),
                partition_across_hosts=sweep_options.get(
                    "partition_across_hosts", True),
                deadline_s=sweep_options.get("deadline_s"),
                chunk_callback=sweep_options.get("chunk_callback"),
                **search_kwargs,
            )
        else:
            results = multi_outcome_kernel_search(
                X=self.X.to_numpy(),
                Ys=self.Y.to_numpy(),
                out_names=self.out_names,
                **search_kwargs,
            )
        for feat, res in results.items():
            self.models[feat] = res["best_model"]
            self.search_info[feat] = res
        elapsed = np.round((time.time() - start) / 60, 1)
        print(f"Finished {n_out} outcomes, elapsed time: {elapsed} minutes")

    # ------------------------------------------------------------------
    # multi-output paths (model_search.py:519-820)
    # ------------------------------------------------------------------
    def multioutput_penalized_optimization(self, **kwargs):
        from .models.lmc import fit_multioutput

        self.model_selection_type = "multioutput_penalized"
        self.mo_result = fit_multioutput(
            self.X.to_numpy(),
            self.Y.to_numpy(),
            cat_vars=self.cat_idx,
            num_vars=self.cont_idx,
            unit_idx=self.unit_idx,
            var_names=self.feat_names,
            likelihood=self.likelihood,
            **kwargs,
        )
        return self.mo_result

    def run_penalized_search(self, *args, **kwargs):
        """Deprecated in the reference (model_search.py:957-959)."""
        raise NotImplementedError(
            "run_penalized_search is deprecated; use penalized_optimization"
            " or multioutput_lam_search instead."
        )

    def plot_latent_processes(self, x_axis_label=None, **kwargs):
        from .plots import plot_latent_processes

        assert hasattr(self, "mo_result"), (
            "Run multioutput_penalized_optimization first"
        )
        res = self.mo_result
        if isinstance(res, dict):
            res = res["final_model"]
        x_idx = (self.feat_names.index(x_axis_label)
                 if x_axis_label else (self.cont_idx or [0])[0])
        return plot_latent_processes(res, self.X.to_numpy(), x_idx=x_idx,
                                     **kwargs)

    def plot_multioutput_predictions(self, x_axis_label=None, **kwargs):
        from .plots import plot_multioutput_predictions

        assert hasattr(self, "mo_result"), (
            "Run multioutput_penalized_optimization first"
        )
        res = self.mo_result
        if isinstance(res, dict):
            res = res["final_model"]
        x_idx = (self.feat_names.index(x_axis_label)
                 if x_axis_label else (self.cont_idx or [0])[0])
        return plot_multioutput_predictions(
            res, self.X.to_numpy(), self.Y.to_numpy(), x_idx=x_idx,
            out_names=self.out_names, **kwargs,
        )

    def multioutput_lam_search(self, **kwargs):
        from .search.lam import multioutput_lam_search

        self.model_selection_type = "multioutput_lam_search"
        self.mo_result = multioutput_lam_search(
            self.X.to_numpy(),
            self.Y.to_numpy(),
            cat_vars=self.cat_idx,
            num_vars=self.cont_idx,
            unit_idx=self.unit_idx,
            var_names=self.feat_names,
            likelihood=self.likelihood,
            **kwargs,
        )
        return self.mo_result

    # ------------------------------------------------------------------
    # display helpers
    # ------------------------------------------------------------------
    def reverse_transform(self, mu, x_idx=None, y_col=None):
        """Undo X/Y standardization for display (model_search.py:1677-1715)."""
        out = np.asarray(mu)
        if y_col is not None and hasattr(self, "Y_stds"):
            out = out * float(self.Y_stds[y_col])
            if hasattr(self, "Y_means"):
                out = out + float(self.Y_means[y_col])
        if x_idx is not None and hasattr(self, "X_stds"):
            name = self.feat_names[x_idx]
            if name in self.X_stds.index:
                out = out * float(self.X_stds[name]) + float(
                    self.X_means[name]
                )
        return out

    def _x_display_transform(self):
        """(dim, values) -> values in original X units
        (model_search.py:1677-1695)."""
        def tf(dim, values):
            name = self.feat_names[dim]
            if hasattr(self, "X_stds") and name in self.X_stds.index:
                return (np.asarray(values) * float(self.X_stds[name])
                        + float(self.X_means[name]))
            return values
        return tf

    def _y_display_transform(self, out_label):
        """values -> values in original Y units
        (model_search.py:1697-1715)."""
        def tf(values):
            out = np.asarray(values)
            if self.Y_transform in ("standardize", "scale"):
                out = out * float(self.Y_stds[out_label])
            if self.Y_transform == "standardize":
                out = out + float(self.Y_means[out_label])
            return out
        return tf

    def importance_frame(self) -> pd.DataFrame:
        """Outcomes × component-name importance table (heatmap input,
        model_search.py:1271-1443).

        Penalized models contribute their per-component importances;
        search models contribute per-component variance explained
        (var_exp — the quantity the reference's heatmap plots after
        run_search, model_search.py:1228-1234)."""
        rows = {}
        for feat, model in self.models.items():
            if (getattr(self, "model_selection_type", "") == "search"
                    and hasattr(self, "search_info")):
                info = self.search_info.get(feat, {})
                var_exp = list(info.get("var_exp", []))
                name = info.get("best_model_name") or model.kernel_name
                comps = ([] if name in (None, "constant")
                         else name.split("+"))
                row = {}
                for i, c in enumerate(comps):
                    if i < len(var_exp):
                        row[c] = float(var_exp[i])
                row["residual"] = (float(var_exp[-1]) if var_exp else 1.0)
                rows[feat] = row
            else:
                rows[feat] = model.component_importance_dict
        df = pd.DataFrame(rows).T.fillna(0.0)
        # replace dim indices with column names (utilities.py:266-278)
        df.columns = [
            replace_kernel_variables(c, self.feat_names) for c in df.columns
        ]
        return df

    def plot_heatmap(self, **kwargs):
        from .plots import plot_heatmap

        return plot_heatmap(self.importance_frame(), **kwargs)

    def plot_parts(self, out_label, x_idx=None, x_axis_label=None, **kwargs):
        from .plots import pred_kernel_parts

        model = self.models[out_label]
        if x_idx is None and x_axis_label is not None:
            x_idx = self.feat_names.index(x_axis_label)
        kwargs.setdefault("categorical_dict", self.categorical_dict)
        kwargs.setdefault("x_transform", self._x_display_transform())
        kwargs.setdefault("y_transform", self._y_display_transform(out_label))
        return pred_kernel_parts(
            model,
            data=(self.X.to_numpy(), self.Y[out_label].to_numpy()[:, None]),
            x_idx=x_idx if x_idx is not None else (self.cont_idx or [0])[0],
            col_names=self.feat_names,
            unit_idx=self.unit_idx,
            **kwargs,
        )

    def plot_marginal(self, out_label, x_axis_label, **kwargs):
        from .plots import gp_predict_fun

        model = self.models[out_label]
        x_idx = self.feat_names.index(x_axis_label)
        # reference flag (model_search.py:1606): False (their default)
        # plots standardized axes; True reverse-transforms tick labels.
        # We reverse-transform by default, so False maps to identity.
        if not kwargs.pop("reverse_transform_axes", True):
            kwargs.setdefault("x_transform", lambda d, v: v)
            kwargs.setdefault("y_transform", lambda v: v)
        kwargs.setdefault("x_transform", self._x_display_transform())
        kwargs.setdefault("y_transform", self._y_display_transform(out_label))
        return gp_predict_fun(
            model,
            x_idx=x_idx,
            X=self.X.to_numpy(),
            Y=self.Y[out_label].to_numpy()[:, None],
            col_names=self.feat_names,
            unit_idx=self.unit_idx,
            **kwargs,
        )

    def plot_feature_metrics(self, feature_name, **kwargs):
        from .plots import plot_feature_metrics

        return plot_feature_metrics(
            self.importance_frame(), feature_name, **kwargs
        )
