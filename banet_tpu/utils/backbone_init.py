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


_BN_FIELD = {"weight": "scale", "bias": "bias",
             "running_mean": "mean", "running_var": "var"}


def torch_drn_key_to_flax(key: str):
    """Map one public-torch-DRN ``state_dict`` key (fyu/drn naming) to
    our flat ``.npy`` dict key, or None to drop it.

    This is the executable form of the docs/REAL_DATA.md key table
    (reference enc.py:241-251 loads the same weights into TF by name).
    Covered kinds — DRN-D has no others:
      layer0.{0,1}.*                     stem conv + bn
      layer{L}.{3k,3k+1}.*               plain conv levels (Sequential
                                         indices: Conv 3k, BN 3k+1,
                                         ReLU 3k+2 — ReLU paramless)
      layer{L}.{i}.conv{N}/bn{N}.*       BasicBlock convs/bns
      layer{L}.{i}.downsample.{0,1}.*    projection shortcut
      fc.* / num_batches_tracked         dropped
    BN fields: weight->scale, bias->bias, running_mean->stats:mean,
    running_var->stats:var.
    """
    import re

    parts = key.split(".")
    field = parts[-1]
    if field == "num_batches_tracked" or parts[0] == "fc":
        return None

    def bn(prefix: str):
        f = _BN_FIELD.get(field)
        if f is None:
            return None
        k = f"{prefix}/BatchNorm_0/{f}"
        return STATS_PREFIX + k if field.startswith("running_") else k

    if parts[0] == "layer0":
        if parts[1] == "0" and field == "weight":
            return "layer0/Conv_0/kernel"
        if parts[1] == "1":
            return bn("layer0")
        return None
    m = re.fullmatch(r"layer(\d+)", parts[0])
    if not m:
        return None
    L = m.group(1)
    # Plain conv level: layer{L}.{idx}.{field} with a numeric second
    # part — Sequential [Conv, BN, ReLU] repeated, so Conv at 3k,
    # BN at 3k+1.
    if len(parts) == 3 and parts[1].isdigit():
        idx = int(parts[1])
        k3, rem = divmod(idx, 3)
        if rem == 0 and field == "weight":
            return f"layer{L}_{k3}/Conv_0/kernel"
        if rem == 1:
            return bn(f"layer{L}_{k3}")
        return None
    # BasicBlock: layer{L}.{i}.conv{N}/bn{N}/downsample.{0,1}
    i = parts[1]
    sub = parts[2]
    if sub.startswith("conv") and field == "weight":
        return f"layer{L}_{i}/conv_bn{sub[4:]}/Conv_0/kernel"
    if sub.startswith("bn"):
        return bn(f"layer{L}_{i}/conv_bn{sub[2:]}")
    if sub == "downsample":
        if parts[3] == "0" and field == "weight":
            return f"layer{L}_{i}/downsample/Conv_0/kernel"
        if parts[3] == "1":
            return bn(f"layer{L}_{i}/downsample")
    return None


def convert_torch_drn_state_dict(sd: Dict[str, Any]
                                 ) -> Dict[str, np.ndarray]:
    """Convert a whole torch DRN ``state_dict``-like mapping (keys as
    in the public fyu/drn checkpoints; values anything numpy-able —
    torch tensors work via ``np.asarray``) into the flat dict
    ``seed_backbone`` consumes.  Conv kernels may remain OIHW
    (seed_backbone transposes on shape match)."""
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        fk = torch_drn_key_to_flax(str(k))
        if fk is not None:
            out[fk] = np.asarray(v)
    return out


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
