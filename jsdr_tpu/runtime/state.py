"""Checkpoint / resume of stream-processing state.

The reference has no processing-state persistence (SURVEY.md section 5);
here every demodulator's carried state is an explicit pytree
(BpskState, AmFmState), so checkpointing is a flat save/load of leaves.
Uses numpy .npz — dependency-free and exact (bit-for-bit resume).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np


def save_state(path: str | Path, state: Any) -> None:
    """Save any pytree of arrays; structure is rebuilt from a treedef of
    the same type at load."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez(path, n_leaves=len(leaves), **arrays)


def load_state(path: str | Path, like: Any) -> Any:
    """Load into the structure of ``like`` (same treedef)."""
    data = np.load(path)
    n = int(data["n_leaves"])
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    _, treedef = jax.tree.flatten(like)
    return jax.tree.unflatten(treedef, leaves)
