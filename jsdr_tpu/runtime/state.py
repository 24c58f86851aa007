"""Checkpoint / resume of stream-processing state.

The reference has no processing-state persistence (SURVEY.md section 5);
here every demodulator's carried state is an explicit pytree
(BpskState, AmFmState), so checkpointing is a flat save/load of leaves.
Uses numpy .npz — dependency-free and exact (bit-for-bit resume).

The format is versioned (the checkpoint analog of jsdr.properties'
schema-version discard, jsdr.java:242-254): ``save_state`` stamps
``STATE_VERSION`` plus an optional JSON ``meta`` dict (rate, stream
count, ...), and ``load_state`` refuses — with an actionable message —
files whose version, leaf structure, per-leaf shape/dtype, or declared
meta don't match the current configuration, instead of silently
misloading. Pre-versioning files (round <= 4) are refused outright:
BpskState.tu_phase changed units in round 4 (numerators moved to
0.1 Hz resolution), so a legacy file would resume with a 10x-misread
NCO phase; docs/MIGRATION.md documents the manual migration.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np

STATE_VERSION = 2


def save_state(path: str | Path, state: Any,
               meta: Optional[dict] = None) -> None:
    """Save any pytree of arrays; structure is rebuilt from a treedef of
    the same type at load. ``meta`` is an optional JSON-serializable
    dict of configuration facts (e.g. ``{"rate": 96000}``) checked
    against ``expect_meta`` at load."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["meta_json"] = np.frombuffer(
        json.dumps(meta or {}).encode(), np.uint8).copy()
    np.savez(path, state_version=STATE_VERSION, n_leaves=len(leaves),
             **arrays)


def load_state(path: str | Path, like: Any,
               expect_meta: Optional[dict] = None) -> Any:
    """Load into the structure of ``like`` (same treedef), validating
    version, leaf count, per-leaf shape/dtype, and (when given)
    ``expect_meta`` entries against the file's saved meta. Raises
    ``ValueError`` with a config-mismatch diagnosis on any violation."""
    data = np.load(path)
    if "state_version" not in data:
        raise ValueError(
            f"{path}: unversioned (pre-round-5) checkpoint — refusing to "
            "load: BpskState.tu_phase changed units (0.1 Hz NCO "
            "numerators) and would resume with a 10x-misread mix phase. "
            "See docs/MIGRATION.md for the manual migration.")
    version = int(data["state_version"])
    if version != STATE_VERSION:
        raise ValueError(
            f"{path}: checkpoint format v{version}, this build reads "
            f"v{STATE_VERSION} — re-create the checkpoint (or migrate "
            "per docs/MIGRATION.md)")
    n = int(data["n_leaves"])
    like_leaves, treedef = jax.tree.flatten(like)
    if n != len(like_leaves):
        raise ValueError(
            f"{path}: checkpoint has {n} state leaves but the current "
            f"configuration expects {len(like_leaves)} — it was written "
            "under a different stage/state layout")
    saved_meta = {}
    if "meta_json" in data:
        saved_meta = json.loads(bytes(data["meta_json"]).decode())
    for key, want in (expect_meta or {}).items():
        if key not in saved_meta:
            raise ValueError(
                f"{path}: checkpoint meta lacks {key!r} (expected "
                f"{want!r}) — it was written by a caller that did not "
                "record this configuration fact")
        if saved_meta[key] != want:
            raise ValueError(
                f"{path}: checkpoint was written with {key}="
                f"{saved_meta[key]!r} but the current configuration has "
                f"{key}={want!r} — resume under the original "
                "configuration or re-create the checkpoint")
    leaves = []
    for i, lk in enumerate(like_leaves):
        arr = data[f"leaf_{i}"]
        lk_np = np.asarray(lk)
        if tuple(arr.shape) != tuple(lk_np.shape) or arr.dtype != lk_np.dtype:
            raise ValueError(
                f"{path}: state leaf {i} is {arr.dtype}{list(arr.shape)} "
                f"in the checkpoint but {lk_np.dtype}{list(lk_np.shape)} "
                "in the current configuration (different n_streams/"
                "stage config?) — resume under the original configuration")
        leaves.append(arr)
    return jax.tree.unflatten(treedef, leaves)
