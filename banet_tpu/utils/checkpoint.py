"""Checkpointing: Orbax save/restore + optimistic partial restore.

The reference restores TF checkpoints (legacy/ba.py:436-438), loads
encoder backbones from .npy dicts (enc.py:241-251), and — in the
DeepTAM harness — does an "optimistic" restore that silently skips
missing or shape-mismatched variables (deeptam utils/helpers.py:48-130).
Equivalents here:

- ``save_checkpoint``/``restore_checkpoint``: full pytree round-trips
  via Orbax (StandardCheckpointer);
- ``optimistic_restore``: merge a saved param tree into a template,
  keeping template entries whenever the saved tree lacks the path or
  the shapes/dtypes disagree — the backbone-init workflow (train the
  encoder elsewhere, restore into a bigger model).
"""

from __future__ import annotations

import os
from typing import Any, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(path: str, tree: Any) -> None:
    # device_get first: arrays saved straight off an accelerator embed
    # that device's sharding in the checkpoint, and a restore on a
    # different platform (train on TPU -> evaluate on CPU) then fails
    # with "Device ... not found in jax.local_devices()".
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(tree), force=True)


def _restore_numpy(path: str) -> Any:
    """Restore a checkpoint with every leaf forced to np.ndarray,
    ignoring whatever device sharding it was saved with."""
    with ocp.PyTreeCheckpointer() as ckptr:
        meta = ckptr.metadata(path).item_metadata
        restore_args = jax.tree.map(
            lambda m: ocp.RestoreArgs(restore_type=np.ndarray), meta)
        return ckptr.restore(path, restore_args=restore_args)


def restore_checkpoint(path: str, template: Any) -> Any:
    saved = _restore_numpy(os.path.abspath(path))
    return jax.tree.map(
        lambda t, s: jax.numpy.asarray(
            s, dtype=np.asarray(t).dtype), template, saved)


def _flatten_with_paths(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {jax.tree_util.keystr(p): v for p, v in flat}


def optimistic_restore(path: str, template: Any) -> Tuple[Any, list, list]:
    """Restore what matches; keep the template elsewhere.

    Returns (merged_tree, restored_paths, skipped_paths).  Mirrors the
    DeepTAM ``optimistic_restore`` semantics (utils/helpers.py:48-130):
    a variable is restored iff it exists in the checkpoint with the
    same shape and dtype-compatible contents.
    """
    # Restore into an unchecked raw tree first (numpy-forced, so a
    # checkpoint written on another platform restores fine).
    saved = _restore_numpy(os.path.abspath(path))
    saved_flat = _flatten_with_paths(saved)

    restored, skipped = [], []

    def merge(path_leaf, tmpl_leaf):
        key = jax.tree_util.keystr(path_leaf)
        if key in saved_flat:
            cand = np.asarray(saved_flat[key])
            tmpl_dtype = np.dtype(getattr(tmpl_leaf, "dtype",
                                          np.asarray(tmpl_leaf).dtype))
            # Restore only shape-equal AND dtype-kind-compatible leaves:
            # a float may restore into a wider/narrower float, but an
            # int step counter or bool flag must not be coerced into a
            # float leaf (or vice versa) by a silent lossy cast.
            same_kind = (cand.dtype.kind == tmpl_dtype.kind or
                         {cand.dtype.kind, tmpl_dtype.kind} <= {"f", "V"})
            if (tuple(cand.shape) == tuple(np.shape(tmpl_leaf)) and
                    same_kind):
                restored.append(key)
                return jax.numpy.asarray(cand, dtype=tmpl_dtype)
        skipped.append(key)
        return tmpl_leaf

    merged = jax.tree_util.tree_map_with_path(merge, template)
    return merged, restored, skipped
