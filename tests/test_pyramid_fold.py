"""Parity of the folded pyramid aggregation (pyramid._FoldedAgg /
ModelConfig.pyramid_fold_agg) with the faithful concat form — same
parameters, same function (the 1x1 commutes with the fixed bilinear
upsampler)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from banet_tpu.config import default_config
from banet_tpu.models.pyramid import FeaturePyramid


def _layers(key, B=1, H=32, W=48, dtype=jnp.float32):
    """Fake backbone list coarse -> fine (6 maps, halving scales)."""
    chans = [512, 256, 128, 64, 32, 16]
    outs = []
    for i, c in enumerate(chans):
        s = 2 ** (5 - i)
        outs.append(jax.random.normal(
            jax.random.fold_in(key, i), (B, H // s or 1, W // s or 1, c),
            dtype=dtype))
    return outs


@pytest.mark.parametrize("agg_ch,finest", [(128, 0), (None, None)])
def test_fpn_fold_matches_faithful_f32(agg_ch, finest):
    layers = _layers(jax.random.PRNGKey(0))
    base = FeaturePyramid(levels=4, agg_features=agg_ch,
                          finest_convs=finest, dtype=jnp.float32)
    fold = FeaturePyramid(levels=4, agg_features=agg_ch,
                          finest_convs=finest, dtype=jnp.float32,
                          fold_agg=True)
    vars_ = base.init(jax.random.PRNGKey(1), layers)
    # Identical parameter trees (checkpoint compatibility).
    vf = fold.init(jax.random.PRNGKey(2), layers)
    ts = jax.tree_util.tree_structure
    assert ts(vars_) == ts(vf)
    a = base.apply(vars_, layers)
    b = fold.apply(vars_, layers)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=1e-4, atol=1e-5)


def test_fpn_fold_matches_faithful_bf16():
    layers = _layers(jax.random.PRNGKey(3), dtype=jnp.bfloat16)
    base = FeaturePyramid(levels=4, agg_features=128, finest_convs=0)
    fold = FeaturePyramid(levels=4, agg_features=128, finest_convs=0,
                          fold_agg=True)
    vars_ = base.init(jax.random.PRNGKey(4), layers)
    a = base.apply(vars_, layers)
    b = fold.apply(vars_, layers)
    for x, y in zip(a, b):
        x = np.asarray(x, np.float32)
        y = np.asarray(y, np.float32)
        # bf16 reassociation noise only.
        assert np.abs(y - x).max() < 0.15 * (np.abs(x).max() + 1)


def test_flagship_feature_parity_with_fold():
    """Through the full model's features() with shared params."""
    from banet_tpu.models.banet import BANet

    cfg = default_config()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, compute_dtype="float32"))
    cfg_f = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, pyramid_fold_agg=True))
    model = BANet(cfg)
    model_f = BANet(cfg_f)
    img = 255.0 * jax.random.uniform(jax.random.PRNGKey(5),
                                     (1, 32, 48, 3))
    intr_pts = None
    vars_ = model.init(jax.random.PRNGKey(6), img,
                       method=model.features)
    a = model.apply(vars_, img, method=model.features)
    b = model_f.apply(vars_, img, method=model_f.features)
    for x, y in zip(a, b):
        # f32 reassociation through BN rsqrt: a handful of elements at
        # ~1e-4; no structural divergence.
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=2e-2, atol=5e-4)
