"""Greedy kernel-structure search (BIC-driven add/multiply/prune loop).

Re-implements the search driver family of model_search.py:
``full_kernel_search`` (:2987-3272), ``loc_kernel_search`` (:2347-2558),
``prod_kernel_creation`` (:2561-2664), ``check_if_better_metric``
(:2667-2681), ``keep_top_k`` (:2684-2710), ``prune_best_model2``
(:2778-2984), and ``split_kernel_search`` (:3275-3532).

Control flow stays host-side Python (exactly like the reference); what
changes is the execution model: every candidate generated in an expansion
step is fitted in ONE vmapped coded-structure batch (search/engine.py)
instead of one sequential GPflow fit per candidate.
"""

from __future__ import annotations

from functools import lru_cache

from .._variants import variant_logged
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..kernels.spec import KernelSpec, Primitive
from ..utilities import check_if_model_exists
from .engine import fit_candidates


def _comp_name(comp: Tuple[Primitive, ...]) -> str:
    facs = sorted(p.name for p in comp if p.op != "empty")
    return "*".join(facs)


def _spec_name(spec: KernelSpec) -> str:
    if (len(spec.components) == 1
            and spec.components[0][0].op == "constant"):
        return "constant"
    return "+".join(sorted(_comp_name(c) for c in spec.components))


def _sorted_spec(components) -> KernelSpec:
    comps = sorted(
        [tuple(c) for c in components], key=_comp_name
    )
    return KernelSpec(tuple(comps))


def _warm_raw(child_spec: KernelSpec, parent_spec: KernelSpec,
              parent_raw) -> np.ndarray:
    """Child (C, F, P) init overlaid with the parent's fitted raw params.

    Warm-starting expansion candidates from their parent's optimum
    (arXiv:2405.18328's warm-start marginal-likelihood observation,
    applied to the greedy tree) — a TPU-first deviation from the
    reference's always-fresh ``kernel_test`` inits: shared structure
    re-converges in a fraction of the iterations, and vmapped batch wall
    time is set by the SLOWEST candidate in the batch.

    Components are matched by canonical factor-name multiset; an
    unmatched child component falls back to a parent component whose
    factor set is the child's minus exactly one factor (the extended
    component of a product/split_product expansion, which inherits its
    shared factors' params). Factors map by name within a matched
    component; everything unmatched keeps the default init.
    """
    child = child_spec.padded()
    raw = child.init_raw_params_np()
    Cp, Fp = parent_spec.num_components, parent_spec.max_factors
    praw = np.asarray(parent_raw)[:Cp, :Fp, :]

    def key_of(comp):
        return tuple(sorted(p.name for p in comp if p.op != "empty"))

    pkeys: Dict[tuple, List[int]] = {}
    for ci, comp in enumerate(parent_spec.components):
        pkeys.setdefault(key_of(comp), []).append(ci)
    used: set = set()

    def take(key):
        for ci in pkeys.get(key, ()):
            if ci not in used:
                used.add(ci)
                return ci
        return None

    match: List[Optional[int]] = [None] * len(child.components)
    for ci, comp in enumerate(child.components):  # exact matches first
        if key_of(comp):
            match[ci] = take(key_of(comp))
    for ci, comp in enumerate(child.components):  # then one-extra-factor
        names = list(key_of(comp))
        if match[ci] is not None or len(names) < 2:
            continue
        for drop in range(len(names)):
            m = take(tuple(names[:drop] + names[drop + 1:]))
            if m is not None:
                match[ci] = m
                break
    for ci, comp in enumerate(child.components):  # then one-fewer-factor
        names = set(key_of(comp))                 # (pruning candidates)
        if match[ci] is not None or not names:
            continue
        for pkey, rows in pkeys.items():
            if len(pkey) == len(names) + 1 and names < set(pkey):
                m = take(pkey)
                if m is not None:
                    match[ci] = m
                    break

    for ci, m in enumerate(match):
        if m is None:
            continue
        src_rows = {p.name: fj
                    for fj, p in enumerate(parent_spec.components[m])
                    if p.op != "empty"}
        for fj, p in enumerate(child.components[ci]):
            src = src_rows.get(p.name) if p.op != "empty" else None
            if src is not None and src < Fp:
                raw[ci, fj, :] = praw[m, src, :]
    return raw


def set_feature_kernels(f: int, kern_list: Sequence[str],
                        cat_vars: Sequence[int]) -> List[Primitive]:
    """Per-feature candidate primitives (model_search.py:2337-2344)."""
    if f in cat_vars:
        return [Primitive("categorical", f)]
    return [Primitive(k, f) for k in kern_list]


def generate_candidates(
    X_dim: int,
    kern_list: Sequence[str],
    cat_vars: Sequence[int],
    depth: int,
    base: Optional[KernelSpec] = None,
    base_name: Optional[str] = None,
    operation: str = "sum",
    prev_models: Sequence[str] = (),
) -> List[Tuple[str, KernelSpec]]:
    """One expansion step's candidate list (loc_kernel_search semantics,
    model_search.py:2347-2558), with dedup and the reference's constraints:
    categorical-duplication guards, two-way-interaction-only products."""
    out: List[Tuple[str, KernelSpec]] = []
    seen: List[str] = list(prev_models)

    def maybe_add(name: str, spec: KernelSpec):
        if check_if_model_exists(name, seen):
            return
        seen.append(name)
        out.append((name, spec))

    for f in range(X_dim):
        k_list = set_feature_kernels(f, kern_list, cat_vars)
        # depth-1 "no structure" constant candidate (model_search.py:2385-89)
        if f == 0 and depth == 1 and base is None:
            maybe_add(
                "constant",
                KernelSpec(((Primitive("constant", variance_init=1e-6,
                                       train_variance=False),),)),
            )

        for prim in k_list:
            if base is None:
                maybe_add(prim.name, KernelSpec(((prim,),)))
                continue

            if operation == "sum":
                # skip if base already has a categorical on this feature
                if f"categorical[{f}]" in base_name:
                    continue
                spec = _sorted_spec(list(base.components) + [(prim,)])
                maybe_add(_spec_name(spec), spec)

            elif operation == "product":
                if f"categorical[{f}]" in base_name:
                    continue
                if "*" in base_name:  # two-way interactions only
                    continue
                frozen = Primitive(prim.op, prim.dim, train_variance=False)
                comp = tuple(base.components[0]) + (frozen,)
                spec = _sorted_spec([comp])
                maybe_add(_spec_name(spec), spec)

            elif operation == "split_product":
                # distribute product over each additive term
                # (prod_kernel_creation, model_search.py:2561-2664)
                base_names = [_comp_name(c) for c in base.components]
                for ci, comp in enumerate(base.components):
                    if f"categorical[{f}]" in base_names[ci]:
                        continue
                    if "*" in base_names[ci]:
                        continue
                    frozen = Primitive(prim.op, prim.dim,
                                       train_variance=False)
                    new_comps = list(base.components)
                    new_comps[ci] = tuple(comp) + (frozen,)
                    spec = _sorted_spec(new_comps)
                    maybe_add(_spec_name(spec), spec)
    return out


def check_if_better_metric(search_dict: Dict, depth: int) -> bool:
    """Did this depth improve the best BIC? (model_search.py:2667-2681)."""
    prev_vals = [v["bic"] for v in search_dict.values()
                 if v["depth"] == depth - 1]
    new_vals = [v["bic"] for v in search_dict.values()
                if v["depth"] == depth]
    if prev_vals and new_vals:
        return min(new_vals) < min(prev_vals)
    return False


def keep_top_k(search_dict: Dict, depth: int, metric_diff: float = 6.0,
               split: bool = False) -> Dict:
    """Beam-prune: flag models worse than best by > metric_diff
    (model_search.py:2684-2710)."""
    t = np.log if split else (lambda x: x)
    depth_bics = [v["bic"] for v in search_dict.values()
                  if v["depth"] == depth]
    if not depth_bics:
        return search_dict
    best = min(depth_bics)
    for v in search_dict.values():
        if v["depth"] == depth and v["bic"] - best > t(metric_diff):
            v["try_next"] = False
    return search_dict


def _prune_candidates(best_name: str, best_spec: KernelSpec,
                      prev_models: Sequence[str]
                      ) -> List[Tuple[str, KernelSpec]]:
    """Backward-pruning candidates of prune_best_model2
    (model_search.py:2778-2984): drop each additive term; for product
    terms, drop each factor."""
    comps = list(best_spec.components)
    names = [_comp_name(c) for c in comps]
    out: List[Tuple[str, KernelSpec]] = []
    seen = list(prev_models)

    def maybe_add(spec_comps):
        if not spec_comps:
            return
        spec = _sorted_spec(spec_comps)
        name = _spec_name(spec)
        if check_if_model_exists(name, seen):
            return
        seen.append(name)
        out.append((name, spec))

    if len(comps) <= 1 and "*" not in names[0]:
        return out

    for i, comp in enumerate(comps):
        others = [c for j, c in enumerate(comps) if j != i]
        if "*" in names[i]:
            # replace the product term by each of its factors
            # (prune_prod_kernel, model_search.py:2888-2984)
            for prim in comp:
                if prim.op == "empty":
                    continue
                unfrozen = Primitive(prim.op, prim.dim)
                maybe_add(others + [(unfrozen,)])
        else:
            maybe_add(others)
    return out


def full_kernel_search(
    X,
    Y,
    kern_list: Sequence[str],
    cat_vars: Sequence[int] = (),
    max_depth: int = 5,
    keep_all: bool = False,
    metric_diff: float = 6.0,
    early_stopping: bool = True,
    prune: bool = True,
    num_restart: int = 5,
    lik: str = "gaussian",
    verbose: bool = False,
    keep_only_best: bool = True,
    softmax_select: bool = False,
    random_seed: Optional[int] = None,
    max_iter: int = 200,
    num_inducing_points: int = 500,
    X_holdout=None,
    Y_holdout=None,
    split: bool = False,
    warm_start: bool = False,
    mesh=None,
) -> Dict:
    """The greedy search driver (model_search.py:2987-3272).

    ``mesh``: optional 1-D device mesh — candidate batches shard over
    its devices (engine.fit_candidates)."""
    rng = np.random.default_rng(random_seed)
    X = np.asarray(X, dtype=np.float64)
    Y = np.asarray(Y, dtype=np.float64).reshape(-1, 1)

    # complete cases (model_search.py:3035-3043)
    ok = ~np.isnan(X).any(axis=1) & ~np.isnan(Y[:, 0])
    X, Y = X[ok], Y[ok]

    search_dict: Dict[str, dict] = {}
    edge_list: List[Tuple[str, str]] = []

    fit_kwargs = dict(
        likelihood=lik, num_restart=num_restart, random_seed=random_seed,
        max_iter=max_iter, num_inducing_points=num_inducing_points,
        X_holdout=X_holdout, Y_holdout=Y_holdout, split=split,
        mesh=mesh,
    )

    def fit_and_store(cands, depth, parent_map=None):
        if not cands:
            return
        specs = [s for _, s in cands]
        warm = None
        if warm_start and parent_map:
            warm = []
            for name, spec in cands:
                info = search_dict.get((parent_map or {}).get(name))
                warm.append(
                    _warm_raw(spec, info["spec"],
                              info["params"]["kernel_raw"])
                    if info is not None else None
                )
            if not any(w is not None for w in warm):
                warm = None
        fits, config = fit_candidates(specs, X, Y, init_raw=warm,
                                      **fit_kwargs)
        for i, (name, spec) in enumerate(cands):
            search_dict[name] = {
                "spec": spec,
                "config": config,
                "params": {k: np.asarray(v[i])
                           for k, v in fits.params.items()},
                "bic": fits.bic[i],
                "loglik": float(fits.loglik[i]),
                "depth": depth,
                "parent": (parent_map or {}).get(name, "None"),
                "try_next": True,
            }
            if verbose:
                print(f"Model: {name}, BIC: {fits.bic[i]}")

    d = 1
    for d in range(1, max_depth + 1):
        if verbose:
            print(f"Working on depth {d} now")
        if d == 1:
            cands = generate_candidates(
                X.shape[1], kern_list, cat_vars, depth=1,
            )
            fit_and_store(cands, 1)
        else:
            new_cands: List[Tuple[str, KernelSpec]] = []
            parent_map: Dict[str, str] = {}
            prev = list(search_dict.keys())
            for name in list(search_dict.keys()):
                info = search_dict[name]
                if (info["depth"] != d - 1 or not info["try_next"]
                        or name == "constant"):
                    continue
                for op in ("sum",
                           "split_product"
                           if len(info["spec"].components) > 1
                           else "product"):
                    cands = generate_candidates(
                        X.shape[1], kern_list, cat_vars, depth=d,
                        base=info["spec"], base_name=name, operation=op,
                        prev_models=prev + [c[0] for c in new_cands],
                    )
                    for cname, cspec in cands:
                        parent_map[cname] = name
                        new_cands.append((cname, cspec))
                        edge_list.append((name, cname))
            fit_and_store(new_cands, d, parent_map)
            if not new_cands:
                d -= 1
                break

        depth_entries = [(v["bic"], k) for k, v in search_dict.items()
                         if v["depth"] == d]
        if not depth_entries:
            break
        best_name = min(depth_entries)[1]
        if verbose:
            print(f"Best model for depth {d} is {best_name}")

        # constant best → stop (model_search.py:3151-3155)
        if best_name == "constant":
            if verbose:
                print("Best model is constant, stopping search")
            break

        # early stopping (model_search.py:3157-3178)
        if early_stopping and d > 1:
            if not check_if_better_metric(search_dict, d):
                if verbose:
                    print("No better kernel found in layer, exiting search!")
                if prune:
                    _run_prune(search_dict, d, X, Y, fit_kwargs, verbose,
                               warm_start=warm_start)
                break

        if d != max_depth:
            if not keep_all:
                keep_top_k(search_dict, d, metric_diff, split)
            if softmax_select:
                from .softmax import softmax_kernel_selection

                infos = [(v["bic"], k) for k, v in search_dict.items()]
                chosen = softmax_kernel_selection(
                    [b for b, _ in infos], [k for _, k in infos], rng
                )
                for k, v in search_dict.items():
                    if v["depth"] == d and k != chosen:
                        v["try_next"] = False

        if prune:
            _run_prune(search_dict, d, X, Y, fit_kwargs, verbose,
                               warm_start=warm_start)

    best_name = min(
        (v["bic"], v["depth"], k) for k, v in search_dict.items()
    )[2]
    search_dict[best_name] = _ensure_q(search_dict[best_name], X, Y)

    # R² of best model (model_search.py:3255-3260)
    var_percent = _best_model_rsquare(search_dict[best_name], X, Y)

    best_entry = search_dict[best_name]
    if keep_only_best:
        search_dict = {best_name: best_entry}

    return {
        "models": search_dict,
        "edges": edge_list,
        "best_model": _make_fitted(best_entry, best_name),
        "best_model_name": best_name,
        "var_exp": var_percent,
    }


def _run_prune(search_dict, depth, X, Y, fit_kwargs, verbose,
               warm_start=False):
    depth_entries = [(v["bic"], k) for k, v in search_dict.items()
                     if v["depth"] == depth]
    if not depth_entries:
        return
    best_bic, best_name = min(depth_entries)
    best = search_dict[best_name]
    cands = _prune_candidates(best_name, best["spec"],
                              list(search_dict.keys()))
    if not cands:
        return
    if verbose:
        print(f"Pruning now: {[c[0] for c in cands]}")
    specs = [s for _, s in cands]
    warm = None
    if warm_start:
        warm = [_warm_raw(s, best["spec"], best["params"]["kernel_raw"])
                for s in specs]
    fits, config = fit_candidates(specs, X, Y, init_raw=warm,
                                  **fit_kwargs)
    for i, (name, spec) in enumerate(cands):
        if fits.bic[i] < best_bic:
            if verbose:
                print(f"New better model found: {name}")
            search_dict[name] = {
                "spec": spec,
                "config": config,
                "params": {k: np.asarray(v[i])
                           for k, v in fits.params.items()},
                "bic": fits.bic[i],
                "loglik": float(fits.loglik[i]),
                "depth": depth,
                "parent": best_name,
                "try_next": True,
            }


@lru_cache(maxsize=64)
def _finalize_fn(config, with_q: bool):
    """One jitted batched finalize program per config: optionally
    materialize the collapsed-bound optimal q, then predict the full +
    every one-cold component mean — ALL winning outcomes of a lockstep
    search in ONE dispatch (per-outcome `_ensure_q` + R² calls were ~2
    tunnel round trips × outcomes ≈ 4 s of a 47 s 16-outcome search;
    search-prof2 receipts, round 5)."""
    import jax
    import jax.numpy as jnp

    from ..models import svgp

    def one(params, coded, y, masks, X):
        if with_q:
            q_mu, q_sqrt = svgp.optimal_q(config, params, X, y,
                                          coded=coded)
            params = dict(params, q_mu=q_mu, q_sqrt_raw=q_sqrt)

        def pred(m):
            mu, _ = svgp.predict_y(config, params, X, component_mask=m,
                                   coded=coded)
            return mu[:, 0]

        return params, jax.vmap(pred)(masks)

    return jax.jit(jax.vmap(one, in_axes=(0, 0, 0, 0, None)))


def _batch_finalize(config, entries, X, Y_cols):
    """Finalize a group of same-config winners in one device dispatch.

    Returns a list of (host params dict incl. q, var_exp list) matching
    ``_ensure_q`` + ``_best_model_rsquare`` per entry."""
    import jax
    import jax.numpy as jnp

    C = config.num_components
    F = config.spec.padded().max_factors
    with_q = all("q_mu" not in e["params"] for e in entries)
    if not with_q and any("q_mu" not in e["params"] for e in entries):
        # mixed group (shouldn't happen): per-entry fallback
        return None

    preps = [e["spec"].padded(C, F).coded_np() for e in entries]
    keys = set()
    for p in preps:
        keys.update(p)
    ord_default = np.ones((C, F), dtype=np.int32)
    coded = {k: jnp.asarray(np.stack([p.get(k, ord_default)
                                      for p in preps]))
             for k in sorted(keys)}
    params = jax.tree.map(
        lambda *xs: jnp.asarray(np.stack([np.asarray(x) for x in xs])),
        *[e["params"] for e in entries])
    masks_np = np.zeros((len(entries), C + 1, C))
    for b, e in enumerate(entries):
        na = e["spec"].num_components
        masks_np[b, :, :na] = 1.0
        for i in range(na):
            masks_np[b, 1 + i, i] = 0.0
    Yb = jnp.asarray(np.stack([np.asarray(y).reshape(-1, 1)
                               for y in Y_cols]))
    pout, mus = _finalize_fn(config, with_q)(
        params, coded, Yb, jnp.asarray(masks_np), jnp.asarray(X))
    pout = jax.device_get(pout)
    mus = np.asarray(mus)

    results = []
    for b, (e, y) in enumerate(zip(entries, Y_cols)):
        yv = np.asarray(y).reshape(-1)
        ymu = mus[b, 0]
        sse = float(np.sum((yv - yv.mean()) ** 2))
        ssr = float(np.sum((yv - ymu) ** 2))
        total = 1.0 - ssr / sse
        na = e["spec"].num_components
        if na > 1:
            ssr_c = np.sum((ymu[None, :] - mus[b, 1:1 + na]) ** 2,
                           axis=1)
            shares = total * (1.0 - ssr_c / ssr_c.sum())
            var_exp = [round(float(x), 3) for x in shares]
            var_exp.append(round(float(1.0 - total), 3))
        else:
            var_exp = [round(total, 3), round(1 - total, 3)]
        results.append(({k: v[b] for k, v in pout.items()}, var_exp))
    return results


def _ensure_q(entry, X, Y):
    """Materialize the closed-form (q_mu, q_sqrt) for a collapsed-bound
    winner (Gaussian candidate fits return hyperparameters only —
    engine.materialize_optimal_q has the receipts)."""
    if "q_mu" in entry["params"]:
        return entry
    from .engine import materialize_optimal_q

    config = entry["config"]
    spec = entry["spec"]
    coded = spec.padded(config.num_components,
                        config.spec.padded().max_factors).coded()
    entry = dict(entry)
    entry["params"] = materialize_optimal_q(config, entry["params"],
                                            X, Y, coded)
    return entry


def _make_fitted(entry, name):
    """Wrap a search entry as a FittedGP for the shared API surface."""
    import jax.numpy as jnp

    from ..api import FittedGP

    spec = entry["spec"]
    config = entry["config"]
    C = config.num_components
    Fm = config.spec.padded().max_factors
    n_active = spec.num_components
    component_mask = np.zeros(C)
    component_mask[:n_active] = 1.0
    factor_mask = np.asarray(spec.padded(C, Fm).active_factor_mask(),
                             dtype=float)
    # coded-structure configs need the candidate's own codes at predict time
    fitted = FittedGP(
        config=config,
        params={k: jnp.asarray(v) for k, v in entry["params"].items()},
        component_mask=component_mask,
        factor_mask=factor_mask,
        importances=np.zeros(C + 1),
        penalization_factor=0.0,
        loss=-entry["loglik"],
        component_names=list(spec.component_names()),
        coded=spec.padded(C, Fm).coded(),
    )
    fitted.kernel_name = name
    fitted.search_spec = spec
    fitted.bic = entry["bic"]
    return fitted


@variant_logged
@lru_cache(maxsize=32)
def _rsq_predict_fn(config):
    """Jitted predict_y vmapped over component masks — one compiled
    program per config covers every outcome's R² finalization (the
    one-cold-mask vmap pattern of interpret/importance.py:62-69; replaces
    the per-component predict loop the reference runs,
    utilities.py:131-188)."""
    import jax
    import jax.numpy as jnp

    from ..models import svgp

    def one(mask, params, X, coded):
        mu, _ = svgp.predict_y(config, params, X, component_mask=mask,
                               coded=coded)
        return mu[:, 0]

    return jax.jit(jax.vmap(one, in_axes=(0, None, None, None)))


def _best_model_rsquare(entry, X, Y):
    """Total + per-component R² (calc_rsquare, utilities.py:131-188).

    All (1 + n_active) predictions — the full model plus each
    leave-one-component-out — evaluate in ONE vmapped device call with a
    static (C+1, C) mask stack, so finalizing hundreds of outcomes costs
    hundreds of batched calls, not thousands of sequential ones.
    """
    import jax.numpy as jnp

    from ..interpret.metrics import calc_rsquare_components, calc_rsquare_total

    config = entry["config"]
    spec = entry["spec"]
    params = {k: jnp.asarray(v) for k, v in entry["params"].items()}
    C = config.num_components
    coded = spec.padded(C, config.spec.padded().max_factors).coded()
    n_active = spec.num_components

    masks = np.zeros((C + 1, C))
    masks[:, :n_active] = 1.0
    for i in range(n_active):
        masks[1 + i, i] = 0.0  # one-cold rows
    mus = np.asarray(
        _rsq_predict_fn(config)(jnp.asarray(masks), params,
                                jnp.asarray(X), coded)
    )
    ymu = mus[0][:, None]
    total = float(calc_rsquare_total(jnp.asarray(Y), jnp.asarray(ymu)))
    if n_active > 1:
        shares = calc_rsquare_components(
            jnp.asarray(Y), jnp.asarray(ymu),
            jnp.asarray(mus[1:1 + n_active]),
        )
        return [round(float(x), 3) for x in np.asarray(shares)]
    return [round(total, 3), round(1 - total, 3)]


def split_kernel_search(
    X,
    Y,
    kern_list,
    unit_idx: Optional[int] = None,
    cat_vars=(),
    training_percent: float = 0.7,
    random_seed: Optional[int] = None,
    **kwargs,
):
    """Holdout-scored search: split train/holdout BY UNIT (70/30,
    model_search.py:3326-3335) and score on holdout log-density."""
    rng = np.random.default_rng(random_seed)
    X = np.asarray(X, dtype=np.float64)
    Y = np.asarray(Y, dtype=np.float64).reshape(-1, 1)
    if unit_idx is None:
        n = X.shape[0]
        idx = rng.permutation(n)
        n_train = int(np.floor(training_percent * n))
        train, hold = idx[:n_train], idx[n_train:]
    else:
        units = np.unique(X[:, unit_idx])
        rng.shuffle(units)
        n_train = int(np.floor(training_percent * len(units)))
        train_units = units[:n_train]
        mask = np.isin(X[:, unit_idx], train_units)
        train, hold = np.where(mask)[0], np.where(~mask)[0]
    return full_kernel_search(
        X[train], Y[train], kern_list, cat_vars=cat_vars,
        X_holdout=X[hold], Y_holdout=Y[hold], split=True,
        random_seed=random_seed, **kwargs,
    )


def multi_outcome_kernel_search(
    X,
    Ys,
    kern_list: Sequence[str],
    cat_vars: Sequence[int] = (),
    out_names: Optional[Sequence[str]] = None,
    max_depth: int = 5,
    keep_all: bool = False,
    metric_diff: float = 6.0,
    early_stopping: bool = True,
    prune: bool = True,
    num_restart: int = 5,
    lik: str = "gaussian",
    verbose: bool = False,
    random_seed: Optional[int] = None,
    max_iter: int = 200,
    num_inducing_points: int = 500,
    softmax_select: bool = False,
    split: bool = False,
    training_percent: float = 0.7,
    unit_idx: Optional[int] = None,
    warm_start: bool = False,
    mesh=None,
) -> Dict[str, Dict]:
    """Lockstep greedy search over MANY outcomes.

    The reference parallelises `full_kernel_search` per outcome with one
    Ray worker each (model_search.py:1149-1222). Here every outcome's
    search advances depth-by-depth together, and ALL candidates generated
    at a depth — across outcomes — fit as one batched coded-structure
    program (engine.fit_candidates with per-candidate outcome columns).
    Semantics per outcome are identical to ``full_kernel_search``:
    ``softmax_select`` applies the stochastic parent selection
    (model_search.py:3535-3627) independently per outcome, and ``split``
    scores candidates on a unit-level 70/30 holdout instead of BIC
    (split_kernel_search, model_search.py:3326-3335; the split is shared
    by all outcomes since they share X).
    """
    rng = np.random.default_rng(random_seed)
    X = np.asarray(X, dtype=np.float64)
    Ys = np.asarray(Ys, dtype=np.float64)
    if Ys.ndim == 1:
        Ys = Ys[:, None]

    X_holdout = Ys_holdout = None
    if split:
        if unit_idx is None:
            n = X.shape[0]
            idx = rng.permutation(n)
            n_train = int(np.floor(training_percent * n))
            train, hold = idx[:n_train], idx[n_train:]
        else:
            units = np.unique(X[:, unit_idx])
            rng.shuffle(units)
            n_train = int(np.floor(training_percent * len(units)))
            mask = np.isin(X[:, unit_idx], units[:n_train])
            train, hold = np.where(mask)[0], np.where(~mask)[0]
        X_holdout, Ys_holdout = X[hold], Ys[hold]
        X, Ys = X[train], Ys[train]

    B = Ys.shape[1]
    if out_names is None:
        out_names = [f"y{i}" for i in range(B)]

    fit_kwargs = dict(
        likelihood=lik, num_restart=num_restart, random_seed=random_seed,
        max_iter=max_iter, num_inducing_points=num_inducing_points,
        X_holdout=X_holdout, Y_holdout=Ys_holdout, split=split,
        mesh=mesh,
    )

    states = {
        o: {"search_dict": {}, "edges": [], "active": True}
        for o in out_names
    }
    col = {o: i for i, o in enumerate(out_names)}

    def _warm_list(cands):
        """Per-candidate warm-start raw arrays from fitted parents
        (``warm_start`` mode; None entries keep the default init)."""
        if not warm_start:
            return None
        warm = []
        for o, _name, spec, parent in cands:
            info = states[o]["search_dict"].get(parent)
            warm.append(
                _warm_raw(spec, info["spec"], info["params"]["kernel_raw"])
                if info is not None else None
            )
        return warm if any(w is not None for w in warm) else None

    def fit_and_store(cands, depth):
        """cands: list of (outcome, name, spec, parent)."""
        if not cands:
            return
        specs = [c[2] for c in cands]
        y_cols = [col[c[0]] for c in cands]
        fits, config = fit_candidates(specs, X, Ys, y_cols=y_cols,
                                      init_raw=_warm_list(cands),
                                      **fit_kwargs)
        for i, (o, name, spec, parent) in enumerate(cands):
            states[o]["search_dict"][name] = {
                "spec": spec,
                "config": config,
                "params": {k: np.asarray(v[i])
                           for k, v in fits.params.items()},
                "bic": fits.bic[i],
                "loglik": float(fits.loglik[i]),
                "depth": depth,
                "parent": parent,
                "try_next": True,
            }

    def collect_prune(o, depth):
        sd = states[o]["search_dict"]
        entries = [(v["bic"], k) for k, v in sd.items()
                   if v["depth"] == depth]
        if not entries:
            return []
        best_bic, best_name = min(entries)
        cands = _prune_candidates(best_name, sd[best_name]["spec"],
                                  list(sd.keys()))
        return [(o, name, spec, best_name, best_bic)
                for name, spec in cands]

    for d in range(1, max_depth + 1):
        if verbose:
            print(f"[lockstep] depth {d}")
        all_cands = []
        for o in out_names:
            st = states[o]
            if not st["active"]:
                continue
            sd = st["search_dict"]
            if d == 1:
                for name, spec in generate_candidates(
                    X.shape[1], kern_list, cat_vars, depth=1,
                ):
                    all_cands.append((o, name, spec, "None"))
            else:
                prev = list(sd.keys())
                mine: List[str] = []
                for name in list(sd.keys()):
                    info = sd[name]
                    if (info["depth"] != d - 1 or not info["try_next"]
                            or name == "constant"):
                        continue
                    for op in ("sum",
                               "split_product"
                               if len(info["spec"].components) > 1
                               else "product"):
                        for cname, cspec in generate_candidates(
                            X.shape[1], kern_list, cat_vars, depth=d,
                            base=info["spec"], base_name=name,
                            operation=op, prev_models=prev + mine,
                        ):
                            mine.append(cname)
                            all_cands.append((o, cname, cspec, name))
                            st["edges"].append((name, cname))
        if not all_cands:
            break
        fit_and_store(all_cands, d)

        # per-outcome bookkeeping + prune-candidate collection
        prune_cands = []
        for o in out_names:
            st = states[o]
            if not st["active"]:
                continue
            sd = st["search_dict"]
            entries = [(v["bic"], k) for k, v in sd.items()
                       if v["depth"] == d]
            if not entries:
                st["active"] = False
                continue
            best_name = min(entries)[1]
            stop = False
            if best_name == "constant":
                stop = True
            elif early_stopping and d > 1 and not check_if_better_metric(
                sd, d
            ):
                stop = True
            if d == max_depth:
                stop = True
            if not keep_all:
                keep_top_k(sd, d, metric_diff, split)
            if softmax_select and not stop:
                from .softmax import softmax_kernel_selection

                infos = [(v["bic"], k) for k, v in sd.items()]
                chosen = softmax_kernel_selection(
                    [b for b, _ in infos], [k for _, k in infos], rng
                )
                for k, v in sd.items():
                    if v["depth"] == d and k != chosen:
                        v["try_next"] = False
            if prune:
                prune_cands.extend(collect_prune(o, d))
            if stop:
                st["active"] = False

        if prune and prune_cands:
            specs = [c[2] for c in prune_cands]
            y_cols = [col[c[0]] for c in prune_cands]
            fits, config = fit_candidates(
                specs, X, Ys, y_cols=y_cols,
                init_raw=_warm_list([c[:4] for c in prune_cands]),
                **fit_kwargs)
            for i, (o, name, spec, parent, best_bic) in enumerate(
                prune_cands
            ):
                if fits.bic[i] < best_bic:
                    states[o]["search_dict"][name] = {
                        "spec": spec,
                        "config": config,
                        "params": {k: np.asarray(v[i])
                                   for k, v in fits.params.items()},
                        "bic": fits.bic[i],
                        "loglik": float(fits.loglik[i]),
                        "depth": d,
                        "parent": parent,
                        "try_next": True,
                    }

        if not any(st["active"] for st in states.values()):
            break

    out: Dict[str, Dict] = {}
    # batched finalize: group winners by config (= padded shape family)
    # and run optimal-q + R² predictions for a whole group in one
    # dispatch instead of ~2 tunnel round trips per outcome
    from collections import defaultdict

    groups = defaultdict(list)
    best_names: Dict[str, str] = {}
    for o in out_names:
        sd = states[o]["search_dict"]
        if not sd:
            out[o] = {"models": {}, "edges": [], "best_model": None,
                      "best_model_name": None, "var_exp": []}
            continue
        best_names[o] = min(
            (v["bic"], v["depth"], k) for k, v in sd.items()
        )[2]
        groups[sd[best_names[o]]["config"]].append(o)

    for config, grp in groups.items():
        entries = [states[o]["search_dict"][best_names[o]] for o in grp]
        finals = _batch_finalize(config, entries, X,
                                 [Ys[:, [col[o]]] for o in grp])
        for i, o in enumerate(grp):
            sd = states[o]["search_dict"]
            name = best_names[o]
            yb = Ys[:, [col[o]]]
            if finals is None:
                entry = sd[name] = _ensure_q(sd[name], X, yb)
                var_exp = _best_model_rsquare(entry, X, yb)
            else:
                params_b, var_exp = finals[i]
                entry = sd[name] = dict(sd[name], params=params_b)
            out[o] = {
                "models": {name: entry},
                "edges": states[o]["edges"],
                "best_model": _make_fitted(entry, name),
                "best_model_name": name,
                "var_exp": var_exp,
            }
    return out
