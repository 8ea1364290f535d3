"""Checkpoint/resume via orbax (SURVEY §5: the reference has none —
its runs are seconds long; this matters for long pose-graph optimisations
and large batched sweeps).

Minimal API: save/restore any pytree of arrays (FusionOutputs,
PoseGraphState, optimiser state, …) plus a JSON-able metadata dict.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import numpy as np


def save_checkpoint(path: str, state: Any, metadata: Optional[dict] = None) -> None:
    """Persist a pytree of arrays to ``path`` (a directory)."""
    import jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.join(path, "state"), jax.tree.map(np.asarray, state), force=True)
    ckpt.wait_until_finished()
    if metadata is not None:
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(metadata, f, indent=2, default=str)


def restore_checkpoint_untyped(path: str) -> Tuple[Any, Optional[dict]]:
    """Restore a checkpoint WITHOUT a target pytree.

    Returns the state as saved, with NamedTuples decayed to plain dicts
    (orbax serialises structure as containers) — callers rebuild typed
    containers themselves (see ``parallel.mesh.fuse_buckets_checkpointed``).
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    state = ckpt.restore(os.path.join(path, "state"))
    meta_path = os.path.join(path, "metadata.json")
    metadata = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            metadata = json.load(f)
    return state, metadata


def restore_checkpoint(path: str, target: Any) -> Tuple[Any, Optional[dict]]:
    """Restore a pytree saved by ``save_checkpoint``.

    ``target`` is a pytree of the same structure (arrays may be abstract or
    concrete examples). Returns (state, metadata-or-None).
    """
    import jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    state = ckpt.restore(
        os.path.join(path, "state"), jax.tree.map(np.asarray, target)
    )
    meta_path = os.path.join(path, "metadata.json")
    metadata = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            metadata = json.load(f)
    return state, metadata
