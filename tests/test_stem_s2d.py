"""Parity of the space-to-depth stem rewrite (models/stem_s2d.py) with
the standard DRN stem: same parameter tree, same function."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from banet_tpu.models.drn import DRN
from banet_tpu.models.stem_s2d import (depth_to_space, pad_one_block,
                                       space_to_depth)


def _drn_pair(pad_mode, dtype):
    kw = dict(variant="drn38", image_mean=(0.0, 0.0, 0.0),
              image_std=(1.0, 1.0, 1.0), dtype=dtype, pad_mode=pad_mode)
    return DRN(stem_s2d=False, **kw), DRN(stem_s2d=True, **kw)


def test_s2d_roundtrip():
    x = jnp.arange(2 * 8 * 12 * 3, dtype=jnp.float32).reshape(2, 8, 12, 3)
    s = space_to_depth(x)
    assert s.shape == (2, 4, 6, 12)
    np.testing.assert_array_equal(depth_to_space(s), x)
    # Channel order (pi, pj, c): phase (1, 0) of block (0, 0) is the
    # original pixel (1, 0).
    np.testing.assert_array_equal(s[0, 0, 0, 2 * 3:3 * 3], x[0, 1, 0])


def test_pad_one_block_matches_original_domain_pad():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 10, 4), jnp.float32)
    for mode, np_mode in (("symmetric", "symmetric"), ("zero", "constant")):
        want = space_to_depth(jnp.asarray(np.pad(
            np.asarray(x), ((0, 0), (2, 2), (2, 2), (0, 0)), mode=np_mode)))
        got = pad_one_block(space_to_depth(x), mode)
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("pad_mode", ["symmetric", "zero"])
def test_stem_s2d_matches_standard_drn(pad_mode):
    """Full-backbone parity in float32: identical param tree, every
    output layer equal to ~1e-5 (conv reassociation only)."""
    std, s2d = _drn_pair(pad_mode, jnp.float32)
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.uniform(0, 255, (1, 64, 96, 3)), jnp.float32)
    vars_std = std.init(jax.random.PRNGKey(0), img)
    vars_s2d = s2d.init(jax.random.PRNGKey(0), img)
    assert (jax.tree_util.tree_structure(vars_std)
            == jax.tree_util.tree_structure(vars_s2d))
    # Make BN stats non-trivial so the inference normalization is real.
    stats = jax.tree_util.tree_map(
        lambda v: jnp.asarray(rng.uniform(0.5, 1.5, v.shape), v.dtype),
        vars_std["batch_stats"])
    vars_std = {"params": vars_std["params"], "batch_stats": stats}
    out_std = std.apply(vars_std, img)
    out_s2d = s2d.apply(vars_std, img)
    assert len(out_std) == len(out_s2d)
    for a, b in zip(out_std, out_s2d):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-5)


def test_stem_s2d_bf16_close():
    std, s2d = _drn_pair("symmetric", jnp.bfloat16)
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.uniform(0, 255, (1, 32, 48, 3)), jnp.float32)
    variables = std.init(jax.random.PRNGKey(0), img)
    out_std = std.apply(variables, img)
    out_s2d = s2d.apply(variables, img)
    for a, b in zip(out_std, out_s2d):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        # bf16 quantum at these magnitudes is ~1-2; compare relative to
        # the layer's scale (reassociation noise only).
        np.testing.assert_allclose(a, b, rtol=0,
                                   atol=0.05 * max(np.abs(a).max(), 1.0))


def test_stem_s2d_refuses_train():
    _, s2d = _drn_pair("symmetric", jnp.float32)
    img = jnp.zeros((1, 64, 64, 3))
    variables = s2d.init(jax.random.PRNGKey(0), img)
    with pytest.raises(ValueError):
        s2d.apply(variables, img, train=True,
                  mutable=["batch_stats"])
