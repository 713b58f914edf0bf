"""Chunked, checkpointed greedy-search sweep over many outcomes.

The reference's ``run_search`` farms one ``full_kernel_search`` Ray worker
per outcome in batches of ``5*num_cpus`` under a 12 h SLURM limit
(model_search.py:1149-1222, examples/iHMP/ihmp_waveome_hpc_run.py:176)
and loses all in-flight work on a crash. Here the lockstep engine
(``multi_outcome_kernel_search``) advances a CHUNK of outcomes together —
bounding device memory: each depth's candidate batch is
O(chunk_size x candidates) wide — and per-outcome results persist to a
``SweepCheckpoint`` as chunks complete, so an interrupted full-metabolome
search resumes instead of refitting.

Persisted payloads are plain numpy (npz): the fitted parameter pytree,
the coded kernel-structure arrays, masks, BIC/loglik, per-component
variance explained, and the kernel name; ``FittedGP`` handles are rebuilt
from them on resume (``_fitted_from_payload``), so a resumed sweep's
models predict/plot exactly like freshly-fitted ones.
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Sequence

import jax
import numpy as np

from ..checkpoint import SweepCheckpoint
from ..parallel.mesh import process_partition
from .greedy import multi_outcome_kernel_search


def _payload_from_result(res: dict) -> dict:
    """Flatten one outcome's search result into an npz-safe tree."""
    fitted = res["best_model"]
    name = res["best_model_name"]
    payload = {
        "kernel_name": np.asarray(name if name is not None else ""),
        "var_exp": np.asarray(res.get("var_exp", []), dtype=np.float64),
        "bic": np.asarray(float(fitted.bic)),
        "loglik": np.asarray(-float(fitted.loss)),
        "component_mask": np.asarray(fitted.component_mask),
        "factor_mask": np.asarray(fitted.factor_mask),
        "params": {k: np.asarray(v) for k, v in fitted.params.items()},
        "coded": {k: np.asarray(v) for k, v in fitted.coded.items()},
    }
    return payload


def _fitted_from_payload(payload: dict, likelihood: str, num_data: int,
                         input_dim: int):
    """Rebuild a predict-capable ``FittedGP`` from a persisted payload.

    Mirrors ``greedy._make_fitted``: the config's ``spec`` only supplies
    padded shapes in coded-structure mode (the candidate's real structure
    rides in the ``coded`` arrays), and ``kernel_name`` is restored from
    the payload rather than derived from masks.
    """
    import jax.numpy as jnp

    from ..api import FittedGP
    from ..kernels import spec as spec_mod
    from ..kernels import ops as ops_mod
    from ..models import svgp

    name = str(payload["kernel_name"])
    coded = {k: jnp.asarray(v) for k, v in payload["coded"].items()}
    C, F = np.asarray(payload["coded"]["ops"]).shape
    ops_table = tuple(sorted(
        {int(o) for o in np.unique(payload["coded"]["ops"])}
        | {ops_mod.EMPTY}))
    spec = spec_mod.from_name(name if name else "constant").padded(C, F)
    M = int(np.asarray(payload["params"]["q_mu"]).shape[0])
    config = svgp.make_config(
        spec, likelihood, num_data=num_data, input_dim=input_dim,
        num_inducing_points=M, coded_structure=True, coded_ops=ops_table,
    )
    fitted = FittedGP(
        config=config,
        params={k: jnp.asarray(v) for k, v in payload["params"].items()},
        component_mask=np.asarray(payload["component_mask"]),
        factor_mask=np.asarray(payload["factor_mask"]),
        importances=np.zeros(C + 1),
        penalization_factor=0.0,
        loss=-float(payload["loglik"]),
        component_names=list(spec_mod.from_name(
            name if name else "constant").component_names()),
        coded=coded,
    )
    fitted.kernel_name = name
    fitted.bic = float(payload["bic"])
    return fitted


def run_search_sweep(
    X,
    Ys,
    out_names: Optional[Sequence[str]] = None,
    checkpoint_dir: Optional[str] = None,
    chunk_size: int = 64,
    partition_across_hosts: bool = True,
    verbose: bool = True,
    deadline_s: Optional[float] = None,
    chunk_callback=None,
    **search_kwargs,
) -> Dict[str, dict]:
    """Greedy kernel search over outcomes in resumable chunks.

    Returns ``{name: {"best_model", "best_model_name", "var_exp",
    "bic"}}`` — the reduced result ``GPSearch.run_search`` needs for
    ``models``/``search_info``/``importance_frame`` (full per-depth model
    dicts are only available for freshly-fitted chunks and are not
    persisted).

    ``deadline_s`` bounds the sweep's wall clock: no NEW chunk starts
    once the budget is spent (the in-flight chunk always completes and
    checkpoints). Completed outcomes are returned; the rest stay in the
    checkpoint todo-set for the next invocation — this is how a
    session-bounded environment works through a multi-hour sweep across
    several runs (the reference's analogue is resubmitting the SLURM
    array, but it refits everything: ihmp_waveome_hpc_script.sh).

    ``chunk_callback(results)`` fires after every chunk's checkpoint
    commit with the results accumulated so far — callers use it to
    flush a merged artifact per chunk, so a hard kill mid-sweep loses
    at most the in-flight chunk (not the whole run's merged output).
    Callback errors are swallowed: the sweep must outlive its reporter.
    """
    X = np.asarray(X, dtype=np.float64)
    Ys = np.asarray(Ys, dtype=np.float64)
    if Ys.ndim == 1:
        Ys = Ys[:, None]
    N, B = Ys.shape
    if out_names is None:
        out_names = [f"y{i}" for i in range(B)]
    out_names = list(out_names)
    name_to_col = {n: i for i, n in enumerate(out_names)}
    lik = search_kwargs.get("lik", "gaussian")
    lik_name = lik if isinstance(lik, str) else lik.name

    todo = list(out_names)
    if partition_across_hosts and jax.process_count() > 1:
        todo = process_partition(todo)

    ck = (SweepCheckpoint(checkpoint_dir, use_async_sink=True)
          if checkpoint_dir else None)
    results: Dict[str, dict] = {}
    if ck is not None:
        fitted_names = set(ck.fitted())
        for name in todo:
            if name in fitted_names:
                payload = ck.load_outcome(name)
                fitted = _fitted_from_payload(
                    payload, lik_name, N, X.shape[1])
                results[name] = {
                    "best_model": fitted,
                    "best_model_name": fitted.kernel_name or None,
                    "var_exp": list(np.asarray(payload["var_exp"])),
                    "bic": fitted.bic,
                }
        todo = ck.remaining(todo)

    start = time.time()
    done = 0
    for lo in range(0, len(todo), chunk_size):
        if deadline_s is not None and time.time() - start > deadline_s:
            if verbose:
                left = len(todo) - done
                print(f"Sweep budget ({deadline_s:.0f}s) spent; "
                      f"{left} outcomes left for the next resume")
            break
        chunk = todo[lo:lo + chunk_size]
        cols = [name_to_col[n] for n in chunk]
        res = multi_outcome_kernel_search(
            X=X, Ys=Ys[:, cols], out_names=chunk, **search_kwargs)
        for name in chunk:
            r = res[name]
            if r["best_model"] is None:
                results[name] = r
                continue
            results[name] = {
                "best_model": r["best_model"],
                "best_model_name": r["best_model_name"],
                "var_exp": list(np.asarray(r["var_exp"])),
                "bic": float(r["best_model"].bic),
                "models": r.get("models"),
                "edges": r.get("edges"),
            }
            if ck is not None:
                ck.save_outcome(name, _payload_from_result(r))
        if ck is not None:
            ck.commit()
        if chunk_callback is not None:
            try:
                chunk_callback(results)
            except Exception as e:  # noqa: BLE001
                print(f"chunk_callback failed (sweep continues): {e}")
        done += len(chunk)
        if verbose:
            pct = int(round(100 * done / max(len(todo), 1)))
            mins = round((time.time() - start) / 60, 1)
            print(f"Searched {done} outcomes ({pct}%), elapsed time: "
                  f"{mins} minutes")
    return results
