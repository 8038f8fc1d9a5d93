"""Backbone (encoder) initialization from a ``.npy`` weight dict.

Equivalent of the reference's ImageNet-init path (reference
enc.py:241-251 ``load_npy``: a pickled dict of numpy arrays keyed by
variable name, assigned into the TF graph by name match).  Here the
dict keys are slash-joined Flax param paths relative to the encoder
subtree (e.g. ``layer0/Conv_0/kernel``, ``layer3_0/conv_bn1/Conv_0/
kernel``, ``layer0/BatchNorm_0/scale``; batch statistics use
``stats:<path>`` keys), and merging follows the optimistic-restore
contract: a leaf is seeded iff the name exists and the shape matches,
everything else keeps its template value.

Layout conversion: 4-D conv kernels stored as OIHW (torch) or HWIO
(ours/TF) are both accepted — an OIHW array whose transpose matches the
template shape is transposed automatically, so dicts exported from the
public torch DRN checkpoints work without a separate converter.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import numpy as np

STATS_PREFIX = "stats:"


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            else:
                parts.append(str(p))
        out[prefix + "/".join(parts)] = np.asarray(leaf)
    return out


def export_backbone_npy(path: str, variables: Any,
                        encoder_scope: str = "encoder") -> int:
    """Save the encoder param + batch_stats subtrees as a ``.npy`` dict.

    Returns the number of arrays written.  The produced file is what
    ``seed_backbone`` consumes — the hand-off format for "train the
    encoder elsewhere, seed the flagship here" (reference enc.py:241).
    """
    out: Dict[str, np.ndarray] = {}
    params = variables.get("params", {})
    if encoder_scope in params:
        out.update(_flatten(params[encoder_scope]))
    stats = variables.get("batch_stats", {})
    if encoder_scope in stats:
        out.update(_flatten(stats[encoder_scope], STATS_PREFIX))
    np.save(path, np.asarray(out, dtype=object), allow_pickle=True)
    return len(out)


def load_backbone_npy(path: str) -> Dict[str, np.ndarray]:
    """Load a ``.npy`` weight dict (reference enc.py:243 semantics)."""
    obj = np.load(path, allow_pickle=True)
    d = obj.item() if obj.ndim == 0 else dict(obj)
    return {str(k): np.asarray(v) for k, v in d.items()}


def _match(cand: np.ndarray, tmpl_shape: Tuple[int, ...]):
    """Return the candidate reshaped to the template layout, or None.

    Accepts exact-shape matches and OIHW conv kernels (transposed to
    our HWIO)."""
    if tuple(cand.shape) == tuple(tmpl_shape):
        return cand
    if cand.ndim == 4:
        t = np.transpose(cand, (2, 3, 1, 0))  # OIHW -> HWIO
        if tuple(t.shape) == tuple(tmpl_shape):
            return t
    return None


def seed_backbone(variables: Any, weights: Dict[str, np.ndarray],
                  encoder_scope: str = "encoder"
                  ) -> Tuple[Any, List[str], List[str]]:
    """Merge a backbone weight dict into a full model variable tree.

    Args:
      variables: the flagship's init variables ({'params': ..., maybe
        'batch_stats': ...}); only the ``encoder_scope`` subtrees are
        touched.
      weights: flat {relative_path: array} dict (see module docstring).
    Returns (merged_variables, restored_paths, skipped_paths) — same
    contract as utils.checkpoint.optimistic_restore.
    """
    restored: List[str] = []
    skipped: List[str] = []

    def merge_subtree(subtree, key_prefix):
        def merge(path_leaf, tmpl_leaf):
            parts = [str(p.key) if hasattr(p, "key") else str(p)
                     for p in path_leaf]
            key = key_prefix + "/".join(parts)
            if key in weights:
                cand = _match(weights[key], np.shape(tmpl_leaf))
                if cand is not None:
                    restored.append(key)
                    return jax.numpy.asarray(
                        cand, dtype=getattr(tmpl_leaf, "dtype",
                                            np.float32))
            skipped.append(key)
            return tmpl_leaf

        return jax.tree_util.tree_map_with_path(merge, subtree)

    merged = dict(variables)
    if "params" in merged and encoder_scope in merged["params"]:
        params = dict(merged["params"])
        params[encoder_scope] = merge_subtree(params[encoder_scope], "")
        merged["params"] = params
    if "batch_stats" in merged and encoder_scope in merged["batch_stats"]:
        stats = dict(merged["batch_stats"])
        stats[encoder_scope] = merge_subtree(stats[encoder_scope],
                                             STATS_PREFIX)
        merged["batch_stats"] = stats
    return merged, restored, skipped
