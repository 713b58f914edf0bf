"""Checkpoint / resume for outcome sweeps.

The reference has no elastic recovery: a partially-completed Ray batch is
lost if the driver dies; users pickle the whole GPSearch object manually
(SURVEY.md §5.4, examples/iHMP/ihmp_waveome_hpc_run.py:179-180). Here
per-outcome results (parameter pytrees + masks + importances) are persisted
with orbax as they complete, and a resumed sweep skips already-fitted
outcomes.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np


def _np_tree(tree):
    return jax.tree.map(lambda a: np.asarray(a), tree)


class SweepCheckpoint:
    """Append-only store of per-outcome fit results.

    Layout: ``<dir>/manifest.json`` (fitted outcome names + metadata) and
    ``<dir>/<outcome>.npz`` flat arrays per outcome.
    """

    def __init__(self, directory: str):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)
        self.manifest_path = os.path.join(directory, "manifest.json")
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                self.manifest = json.load(f)
        else:
            self.manifest = {"outcomes": [], "meta": {}}

    # -- write --
    def set_meta(self, **meta) -> None:
        self.manifest["meta"].update(meta)
        self._flush()

    def save_outcome(self, name: str, result_tree) -> None:
        flat = {}

        def add(prefix, tree):
            if isinstance(tree, dict):
                for k, v in tree.items():
                    add(f"{prefix}{k}.", v)
            else:
                flat[prefix.rstrip(".")] = np.asarray(tree)

        add("", _np_tree(result_tree))
        np.savez(os.path.join(self.directory, f"{self._safe(name)}.npz"),
                 **flat)
        if name not in self.manifest["outcomes"]:
            self.manifest["outcomes"].append(name)
        self._flush()

    # -- read --
    def fitted(self) -> List[str]:
        return list(self.manifest["outcomes"])

    def remaining(self, all_outcomes: Sequence[str]) -> List[str]:
        done = set(self.manifest["outcomes"])
        return [o for o in all_outcomes if o not in done]

    def load_outcome(self, name: str) -> Dict[str, np.ndarray]:
        path = os.path.join(self.directory, f"{self._safe(name)}.npz")
        with np.load(path) as data:
            flat = {k: data[k] for k in data.files}
        # unflatten dotted keys
        out: Dict = {}
        for k, v in flat.items():
            parts = k.split(".")
            d = out
            for p in parts[:-1]:
                d = d.setdefault(p, {})
            d[parts[-1]] = v
        return out

    def _flush(self) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.manifest, f)
        os.replace(tmp, self.manifest_path)

    @staticmethod
    def _safe(name: str) -> str:
        return "".join(c if c.isalnum() or c in "-_." else "_"
                       for c in name)


def save_params(path: str, params) -> None:
    """Orbax checkpoint of a parameter pytree (whole-model save/restore)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), _np_tree(params), force=True)
    ckptr.wait_until_finished()


def load_params(path: str):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))
