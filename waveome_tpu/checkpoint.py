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
    per-outcome npz payloads — ``<outcome>.npz`` when written
    synchronously, ``<outcome>.bin`` (npz bytes) when streamed through the
    native ``AsyncResultSink`` (runtime.py / native/waveome_host.cc).

    Crash safety with the async sink: ``save_outcome`` enqueues the
    payload on the background writer and defers the manifest entry;
    ``commit()`` flushes the sink FIRST, so the manifest never names an
    outcome whose file is not durably on disk. Outcomes whose file landed
    but whose manifest entry didn't (crash between flush and commit) are
    recovered by ``remaining()`` from the directory listing.
    """

    def __init__(self, directory: str, use_async_sink: bool = False):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)
        self.manifest_path = os.path.join(directory, "manifest.json")
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                self.manifest = json.load(f)
        else:
            self.manifest = {"outcomes": [], "meta": {}}
        self._pending: List[str] = []
        self._recover_from_sink_log()
        self._sink = None
        if use_async_sink:
            from .runtime import AsyncResultSink

            self._sink = AsyncResultSink(directory)

    def _recover_from_sink_log(self) -> None:
        """Outcomes streamed by the async sink whose manifest.json commit
        was lost (crash between sink flush and commit) are recovered from
        the sink's own append-only manifest.log."""
        log = os.path.join(self.directory, "manifest.log")
        if not os.path.exists(log):
            return
        changed = False
        with open(log) as f:
            for line in f:
                name = line.split("\t", 1)[0].strip()
                if (name and name not in self.manifest["outcomes"]
                        and self._payload_path(name) is not None):
                    self.manifest["outcomes"].append(name)
                    changed = True
        if changed:
            self._flush()

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
        if self._sink is not None:
            self._sink.put(name, flat)
            self._pending.append(name)
            return
        np.savez(os.path.join(self.directory, f"{self._safe(name)}.npz"),
                 **flat)
        if name not in self.manifest["outcomes"]:
            self.manifest["outcomes"].append(name)
        self._flush()

    def commit(self) -> None:
        """Flush the async sink and durably record pending outcomes."""
        if not self._pending:
            return
        if self._sink is not None:
            self._sink.flush()
        for name in self._pending:
            if name not in self.manifest["outcomes"]:
                self.manifest["outcomes"].append(name)
        self._pending = []
        self._flush()

    # -- read --
    def fitted(self) -> List[str]:
        return list(self.manifest["outcomes"]) + list(self._pending)

    def remaining(self, all_outcomes: Sequence[str]) -> List[str]:
        done = set(self.manifest["outcomes"]) | set(self._pending)
        return [o for o in all_outcomes if o not in done]

    def _payload_path(self, name: str) -> Optional[str]:
        safe = self._safe(name)
        for suffix in (".npz", ".bin"):
            p = os.path.join(self.directory, safe + suffix)
            if os.path.exists(p):
                return p
        return None

    def load_outcome(self, name: str) -> Dict[str, np.ndarray]:
        path = self._payload_path(name)
        if path is None:
            raise FileNotFoundError(
                f"no checkpoint payload for outcome {name!r} in "
                f"{self.directory}")
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
