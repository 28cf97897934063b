"""Checkpoint/resume for progressive renders and inverse-rendering runs.

The reference has no persistence (SURVEY.md §5) but its accumulation design
is inherently resumable: render state is exactly (pixels, frames)
(buffer.rs:11-13, tracer.rs:115,121). Here the checkpoint additionally
carries the RNG key and any differentiable parameter pytree, so both
progressive forward renders and optimization loops resume bit-exactly —
the elastic-recovery story for long multi-host jobs.

Format: a single .npz with a flattened pytree (keys are tree paths); no
orbax dependency required, though the layout is orbax-convertible.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np


def _flatten(tree: Any):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save_checkpoint(path: str, state: Any) -> None:
    """Atomically save a pytree checkpoint to `path` (.npz)."""
    leaves, treedef = _flatten(state)
    payload = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    payload["__treedef__"] = np.frombuffer(
        json.dumps(str(treedef)).encode(), dtype=np.uint8
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def load_checkpoint(path: str, like: Any) -> Any:
    """Load a checkpoint saved by save_checkpoint into the structure of
    `like` (leaf shapes/dtypes are taken from the file; structure must
    match).

    The saved treedef string is ENFORCED, not advisory: loading a
    same-leaf-count but different-structure checkpoint would silently
    misassign leaves (e.g. swap pixels and key in the render state), so a
    structure mismatch raises instead."""
    with np.load(path) as data:
        leaves_like, treedef = _flatten(like)
        n_saved = sum(1 for k in data.files if k.startswith("leaf_"))
        if n_saved != len(leaves_like):
            raise ValueError(
                f"checkpoint has {n_saved} leaves, expected {len(leaves_like)}"
            )
        if "__treedef__" in data.files:
            saved_def = json.loads(bytes(data["__treedef__"]).decode())
            if saved_def != str(treedef):
                raise ValueError(
                    "checkpoint pytree structure mismatch:\n"
                    f"  saved:    {saved_def}\n"
                    f"  expected: {treedef}"
                )
        leaves = [data[f"leaf_{i}"] for i in range(len(leaves_like))]
    for i, (saved, want) in enumerate(zip(leaves, leaves_like)):
        want = np.asarray(want)
        if saved.shape != want.shape:
            raise ValueError(
                f"checkpoint leaf {i} shape {saved.shape} != expected {want.shape}"
            )
    return jax.tree_util.tree_unflatten(treedef, leaves)


def latest_checkpoint(directory: str, prefix: str = "ckpt_") -> str | None:
    """Return the newest checkpoint path in `directory`, or None."""
    if not os.path.isdir(directory):
        return None
    cands = [
        f
        for f in os.listdir(directory)
        if f.startswith(prefix) and f.endswith(".npz")
    ]
    if not cands:
        return None
    cands.sort()
    return os.path.join(directory, cands[-1])
