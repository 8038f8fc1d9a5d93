"""Parity of the border-corrected symmetric conv (pad_mode
"symmetric_fast", models/drn._FastSymConv3x3) with the explicit
symmetric_pad path — same parameters, same function, no padded-map
copy."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from banet_tpu.config import default_config
from banet_tpu.models.drn import DRN, ConvBN


@pytest.mark.parametrize("H,W,C,F", [(16, 20, 8, 16), (9, 13, 4, 8)])
def test_convbn_symmetric_fast_matches_symmetric(H, W, C, F):
    x = jax.random.normal(jax.random.PRNGKey(0), (1, H, W, C))
    slow = ConvBN(F, kernel=3, dtype=jnp.float32, pad_mode="symmetric")
    fast = ConvBN(F, kernel=3, dtype=jnp.float32,
                  pad_mode="symmetric_fast")
    vars_ = slow.init(jax.random.PRNGKey(1), x)
    want = slow.apply(vars_, x)
    got = fast.apply(vars_, x)  # identical param tree by construction
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_convbn_7x7_falls_back_to_explicit_pad():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 12, 14, 3))
    slow = ConvBN(8, kernel=7, dtype=jnp.float32, pad_mode="symmetric")
    fast = ConvBN(8, kernel=7, dtype=jnp.float32,
                  pad_mode="symmetric_fast")
    vars_ = slow.init(jax.random.PRNGKey(1), x)
    np.testing.assert_allclose(np.asarray(fast.apply(vars_, x)),
                               np.asarray(slow.apply(vars_, x)),
                               rtol=1e-6, atol=1e-6)


def test_full_drn_symmetric_fast_parity():
    """Whole encoder (stem 7x7 fallback + every residual 3x3) agrees
    between the two symmetric modes with SHARED parameters — i.e. any
    symmetric-trained checkpoint runs unchanged under symmetric_fast."""
    kw = dict(variant="drn22", dtype=jnp.float32,
              include_layer1=True)
    slow = DRN(pad_mode="symmetric", **kw)
    fast = DRN(pad_mode="symmetric_fast", **kw)
    x = 255.0 * jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 48, 3))
    vars_ = slow.init(jax.random.PRNGKey(3), x)
    outs_slow = slow.apply(vars_, x)
    outs_fast = fast.apply(vars_, x)
    assert len(outs_slow) == len(outs_fast)
    for a, b in zip(outs_slow, outs_fast):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_flagship_tracker_symmetric_fast_parity():
    """End-to-end pose_track parity through the flagship model: the
    symmetric_fast mode must reproduce the symmetric-trained tracker's
    output (the property that lets inference flip the mode on shipped
    checkpoints)."""
    from banet_tpu.tracking import TwoViewTracker

    H, W, N = 64, 96, 64
    cfg = default_config()
    assert cfg.model.conv_pad_mode == "symmetric"
    tracker = TwoViewTracker.initialize(cfg, image_size=(H, W),
                                        num_points=N)
    cfg_f = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, conv_pad_mode="symmetric_fast"))
    tracker_f = TwoViewTracker(cfg_f, tracker.variables)

    # A well-conditioned rendered pair: both modes converge to the same
    # optimum, so they must agree to ~the solver's own early-exit
    # tolerance.  (On random images with untrained weights the GN
    # cascade chaotically amplifies f32 reassociation noise — the
    # feature-level parity above is the bitwise-ish check.)
    from banet_tpu.data.synthetic import make_plane_scene_pair
    from banet_tpu.geometry.se3 import rotation_geodesic_angle
    from banet_tpu.train.trainer import depth_at_points

    pair = make_plane_scene_pair(jax.random.PRNGKey(5), batch=1,
                                 height=H, width=W)
    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(6, W - 6, N),
                    rng.uniform(6, H - 6, N)], -1).astype(np.float32)
    d = np.asarray(depth_at_points(pair["depth"],
                                   jnp.asarray(pts)[None])[0])
    k = np.asarray(pair["intr"].as_array()[0])
    img1 = np.asarray(pair["image1"][0])
    img2 = np.asarray(pair["image2"][0])

    R0, t0, keep0 = tracker.track(img1, img2, k, pts, d)
    R1, t1, keep1 = tracker_f.track(img1, img2, k, pts, d)
    ang = float(np.asarray(rotation_geodesic_angle(
        jnp.asarray(R0), jnp.asarray(R1)))[0])
    assert ang < 2e-3, ang
    # Untrained features give a shallow optimum: the early-exit
    # threshold quantizes where each mode's solve stops, so allow a
    # few-mm slack (function-level parity is the 1e-5 checks above).
    np.testing.assert_allclose(t1, t0, atol=5e-3)
