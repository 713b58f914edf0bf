"""Chunked outcome-sweep driver with resume — the Ray-driver replacement.

Re-implements the reference's batch orchestration (``run_ray_process``,
utilities.py:1287-1390, and the outcome batching of
penalized_optimization, model_search.py:411-512): outcomes are processed
in device-sized chunks, each chunk is one sharded batched fit, results
stream to the native async sink as they complete, and an interrupted sweep
resumes by skipping already-persisted outcomes (the reference loses all
in-flight work on a crash — SURVEY.md §5.3/5.4).

Multi-host: each process takes its ``process_partition`` slice of the
outcome list (DCN-level scale-out with zero cross-host communication,
matching the reference's SLURM-array pattern).
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Sequence

import jax
import numpy as np

from ..checkpoint import SweepCheckpoint
from ..parallel.mesh import process_partition
from ..runtime import ProgressCounter
from .batch import fit_outcomes_penalized


def run_penalized_sweep(
    X,
    Ys,
    spec,
    out_names: Optional[Sequence[str]] = None,
    checkpoint_dir: Optional[str] = None,
    chunk_size: int = 256,
    partition_across_hosts: bool = True,
    verbose: bool = True,
    keep_params: bool = False,
    **fit_kwargs,
) -> Dict[str, dict]:
    """Fit (potentially tens of thousands of) outcomes in chunks.

    ``Ys``: (N, B) array; ``out_names`` parallel outcome names.
    Returns {name: {"component_mask", "importances", "loss",
    "penalization_factor"}}; full parameter pytrees are persisted to the
    checkpoint directory when given, and additionally kept in the
    returned summaries when ``keep_params`` (so callers like
    ``GPSearch.penalized_optimization(sweep_options=...)`` can build
    predict-capable model handles without re-reading the checkpoint).
    """
    Ys = np.asarray(Ys)
    N, B = Ys.shape
    if out_names is None:
        out_names = [f"y{i}" for i in range(B)]
    out_names = list(out_names)
    name_to_col = {n: i for i, n in enumerate(out_names)}

    todo = list(out_names)
    if partition_across_hosts and jax.process_count() > 1:
        todo = process_partition(todo)

    # async sink: payload writes happen on the native background thread;
    # the manifest commit at each chunk boundary is the durability point
    ck = (SweepCheckpoint(checkpoint_dir, use_async_sink=True)
          if checkpoint_dir else None)
    results: Dict[str, dict] = {}
    if ck is not None:
        fitted = set(ck.fitted())
        for name in todo:
            if name in fitted:
                loaded = ck.load_outcome(name)
                if not keep_params:
                    loaded.pop("params", None)
                results[name] = loaded
        todo = ck.remaining(todo)
    counter = ProgressCounter(total=len(todo))
    start = time.time()
    done = 0
    for lo in range(0, len(todo), chunk_size):
        chunk = todo[lo:lo + chunk_size]
        cols = [name_to_col[n] for n in chunk]
        batch = fit_outcomes_penalized(X, Ys[:, cols], spec, **fit_kwargs)
        for bi, name in enumerate(chunk):
            r = batch.for_outcome(bi)
            summary = {
                "component_mask": np.asarray(r.component_mask),
                "factor_mask": np.asarray(r.factor_mask),
                "importances": np.asarray(r.importances),
                "loss": np.asarray(r.loss),
                "penalization_factor": np.asarray(r.penalization_factor),
            }
            params_np = jax.tree.map(np.asarray, r.params)
            if keep_params:
                summary["params"] = params_np
            results[name] = summary
            if ck is not None:
                ck.save_outcome(name, {**summary, "params": params_np})
            counter.add(1)
        if ck is not None:
            # durable point: async sink flushed, manifest extended — a
            # crash mid-chunk re-fits at most one chunk on resume
            ck.commit()
        done += len(chunk)
        if verbose:
            pct = int(round(100 * done / max(len(todo), 1)))
            mins = round((time.time() - start) / 60, 1)
            print(f"Finished {done} models ({pct}%), elapsed time: "
                  f"{mins} minutes")
    counter.close()
    return results
