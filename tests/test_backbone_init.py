"""Backbone-init loader: .npy dict -> Flax DRN subtree (reference
enc.py:241-251 semantics), round-tripped on a randomly generated dict."""

import jax
import jax.numpy as jnp
import numpy as np

from banet_tpu.config import Config, ModelConfig, SolverConfig
from banet_tpu.geometry.camera import Intrinsics
from banet_tpu.models import BANet, DRN
from banet_tpu.utils.backbone_init import (export_backbone_npy,
                                           load_backbone_npy,
                                           seed_backbone)


def _flagship_vars():
    cfg = Config(model=ModelConfig(backbone="drn22",
                                   compute_dtype="float32"),
                 solver=SolverConfig(level_iters=(1, 1, 1, 1)))
    model = BANet(cfg)
    H, W, B, N = 64, 96, 1, 8
    img = jnp.zeros((B, H, W, 3))
    intr = Intrinsics(jnp.full((B,), 80.0), jnp.full((B,), 80.0),
                      jnp.full((B,), W / 2.0), jnp.full((B,), H / 2.0))
    pts = jnp.full((B, N, 2), 20.0)
    return model.init(jax.random.PRNGKey(0), img, img, intr, pts)


def test_roundtrip_seeds_flagship_encoder(tmp_path):
    # Train-the-encoder-elsewhere stand-in: a separately initialized DRN
    # with different weights.
    drn = DRN(variant="drn22", dtype=jnp.float32)
    dvars = drn.init(jax.random.PRNGKey(7), jnp.zeros((1, 64, 96, 3)))
    src = {"params": {"encoder": dvars["params"]},
           "batch_stats": {"encoder": dvars["batch_stats"]}}
    p = str(tmp_path / "backbone.npy")
    n = export_backbone_npy(p, src)
    assert n > 0

    weights = load_backbone_npy(p)
    variables = _flagship_vars()
    merged, restored, skipped = seed_backbone(variables, weights)

    # Every encoder param must have been seeded with the donor values...
    enc = merged["params"]["encoder"]
    donor = dvars["params"]
    flat_m = jax.tree_util.tree_leaves_with_path(enc)
    flat_d = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_flatten_with_path(donor)[0]}
    n_checked = 0
    for path, leaf in flat_m:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(flat_d[key]), atol=1e-6)
        n_checked += 1
    assert n_checked == len(restored) - sum(
        1 for r in restored if r.startswith("stats:"))

    # ...batch stats too...
    bs = merged["batch_stats"]["encoder"]
    assert jax.tree_util.tree_structure(bs) == \
        jax.tree_util.tree_structure(dvars["batch_stats"])

    # ...and the non-encoder weights are untouched.
    for scope in ("fpn", "dla"):
        before = jax.tree_util.tree_leaves(variables["params"][scope])
        after = jax.tree_util.tree_leaves(merged["params"][scope])
        for a, b in zip(before, after):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not skipped


def test_oihw_kernels_are_transposed(tmp_path):
    drn = DRN(variant="drn22", dtype=jnp.float32)
    dvars = drn.init(jax.random.PRNGKey(3), jnp.zeros((1, 64, 96, 3)))
    src = {"params": {"encoder": dvars["params"]},
           "batch_stats": {"encoder": dvars["batch_stats"]}}
    p = str(tmp_path / "b.npy")
    export_backbone_npy(p, src)
    weights = load_backbone_npy(p)
    # Re-store every conv kernel in torch OIHW layout.
    weights = {k: (np.transpose(v, (3, 2, 0, 1)) if v.ndim == 4 else v)
               for k, v in weights.items()}

    variables = _flagship_vars()
    merged, restored, skipped = seed_backbone(variables, weights)
    assert not skipped
    stem = merged["params"]["encoder"]["layer0"]["Conv_0"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(stem),
        np.asarray(dvars["params"]["layer0"]["Conv_0"]["kernel"]),
        atol=1e-6)


def test_mismatched_and_missing_entries_are_skipped(tmp_path):
    drn = DRN(variant="drn22", dtype=jnp.float32)
    dvars = drn.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 96, 3)))
    src = {"params": {"encoder": dvars["params"]},
           "batch_stats": {"encoder": dvars["batch_stats"]}}
    p = str(tmp_path / "c.npy")
    export_backbone_npy(p, src)
    weights = load_backbone_npy(p)
    # Corrupt one entry's shape and drop another.
    weights["layer0/Conv_0/kernel"] = np.zeros((3, 3, 3, 99), np.float32)
    del weights["layer0/BatchNorm_0/scale"]

    variables = _flagship_vars()
    before_kernel = np.asarray(
        variables["params"]["encoder"]["layer0"]["Conv_0"]["kernel"])
    merged, restored, skipped = seed_backbone(variables, weights)
    assert "layer0/Conv_0/kernel" in skipped
    assert "layer0/BatchNorm_0/scale" in skipped
    np.testing.assert_array_equal(
        np.asarray(
            merged["params"]["encoder"]["layer0"]["Conv_0"]["kernel"]),
        before_kernel)
    assert len(restored) > 0
