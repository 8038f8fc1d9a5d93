"""Multi-plane analytic renderer: cross-view photometric consistency,
trackability, and the rendered TUM-sequence fixture."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from banet_tpu.data.synthetic import (make_plane_scene,
                                      make_plane_scene_pair,
                                      smooth_trajectory,
                                      write_rendered_sequence)
from banet_tpu.geometry.camera import Intrinsics, backproject, warp_points
from banet_tpu.geometry.se3 import exp_so3
from banet_tpu.ops.resample import bilinear_sample


def test_cross_view_consistency():
    # A world point visible in both views must have the same color:
    # warp view-1 pixels through the exact depth and compare against a
    # bilinear lookup in view 2 (excluding occlusion/disocclusion).
    H, W = 64, 80
    key = jax.random.PRNGKey(0)
    render, _ = make_plane_scene(key, num_planes=3)
    intr = Intrinsics(jnp.array([0.9 * W]), jnp.array([0.9 * W]),
                      jnp.array([W / 2.0]), jnp.array([H / 2.0]))
    R = exp_so3(jnp.array([[0.02, -0.01, 0.015]]))[0]
    t = jnp.array([0.03, -0.02, 0.04])
    rgb1, d1 = render(jnp.eye(3), jnp.zeros(3), intr, H, W)
    rgb2, d2 = render(R, t, intr, H, W)

    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    pts = jnp.stack([xx.ravel(), yy.ravel()], axis=-1)[None]
    rays = backproject(pts, intr, normalized=False)
    px, py, _x, _y, z, _ = warp_points(rays, d1.ravel()[None],
                                       R[None], t[None], intr)
    sampled = bilinear_sample(rgb2[None], px, py)[0]
    # Visibility: in-bounds and the warped depth agrees with view 2's
    # depth map (no occluder in front).
    d2s = bilinear_sample(d2[None, :, :, None], px, py)[0, :, 0]
    vis = ((px[0] > 1) & (px[0] < W - 2) & (py[0] > 1) & (py[0] < H - 2)
           & (d1.ravel() > 0) & (jnp.abs(d2s - z[0]) < 0.05))
    err = jnp.abs(sampled - rgb1.reshape(-1, 3))
    mean_err = float(jnp.sum(err * vis[:, None]) /
                     (jnp.sum(vis) * 3))
    assert float(jnp.mean(vis)) > 0.5  # most pixels co-visible
    # [0,255] scale; the residual error is the TEST's bilinear lookup
    # blur on the band-limited texture (the renderer is analytic).
    assert mean_err < 8.0, mean_err


def test_pair_is_trackable_by_gn():
    # The GN pose solver must recover the GT relative pose from the
    # rendered pair using the exact depth — the property that makes
    # this renderer a valid accuracy fixture.
    from banet_tpu.ba.camera_solver import solve_pose_level
    from banet_tpu.config import SolverConfig
    from banet_tpu.data.points import select_points
    from banet_tpu.geometry.se3 import rotation_geodesic_angle

    from banet_tpu.ba.camera_solver import solve_pose_pyramid

    H, W = 96, 128
    pair = make_plane_scene_pair(jax.random.PRNGKey(1), batch=1,
                                 height=H, width=W,
                                 rot_magnitude=0.02,
                                 trans_magnitude=0.03)
    img1 = np.asarray(pair["image1"][0])
    depth1 = np.asarray(pair["depth"][0])
    pts, ds = select_points(img1, depth1, 512, texture_threshold=40.0)
    pts = jnp.asarray(pts)
    rays = backproject(pts, pair["intr"], normalized=False)

    # 2-level coarse-to-fine on raw RGB (no CNN): each level's ref
    # features sampled from view 1 at the scaled points.
    img1c = jax.image.resize(pair["image1"], (1, H // 2, W // 2, 3),
                             "linear")
    img2c = jax.image.resize(pair["image2"], (1, H // 2, W // 2, 3),
                             "linear")
    ref_c = bilinear_sample(img1c, pts[..., 0] / 2, pts[..., 1] / 2)
    ref_f = bilinear_sample(pair["image1"], pts[..., 0], pts[..., 1])
    R0 = jnp.eye(3)[None]
    t0 = jnp.zeros((1, 3))
    cfg = SolverConfig(level_iters=(10, 15))
    damp = lambda a: jnp.full(a.shape[:-1], 1e-3)  # noqa: E731
    R, t, aux = solve_pose_pyramid(
        [ref_c, ref_f], [img2c, pair["image2"]], rays,
        jnp.asarray(ds)[..., 0], R0, t0,
        [pair["intr"].scale(0.5), pair["intr"]], [damp, damp], cfg,
        footprint_hws=["direct", "direct"])
    ang = float(rotation_geodesic_angle(R, pair["R_true"])[0])
    terr = float(jnp.linalg.norm(t - pair["t_true"], axis=-1)[0])
    ang0 = float(rotation_geodesic_angle(R0, pair["R_true"])[0])
    terr0 = float(jnp.linalg.norm(pair["t_true"], axis=-1)[0])
    assert ang < ang0 / 5, (ang, ang0)
    assert terr < terr0 / 2, (terr, terr0)


def test_photometric_augmentation_changes_target_only():
    a = make_plane_scene_pair(jax.random.PRNGKey(2), batch=1, height=32,
                              width=48)
    b = make_plane_scene_pair(jax.random.PRNGKey(2), batch=1, height=32,
                              width=48, photometric_gain=0.2,
                              pixel_noise=3.0)
    np.testing.assert_allclose(np.asarray(a["image1"]),
                               np.asarray(b["image1"]), atol=1e-5)
    assert float(jnp.abs(a["image2"] - b["image2"]).mean()) > 0.5


def test_rendered_sequence_fixture(tmp_path):
    seq = write_rendered_sequence(str(tmp_path / "seq"), num_frames=5,
                                  size=(48, 64), seed=3)
    assert len(seq) == 5
    f = seq[2]
    rgb = f.load_rgb()
    depth = f.load_depth()
    assert rgb.shape == (48, 64, 3) and depth.shape == (48, 64)
    assert float(depth[depth > 0].min()) > 0.5
    gt = seq.groundtruth_trajectory()
    assert len(gt) == 5
    # The trajectory moves but smoothly (consecutive steps are small).
    steps = np.linalg.norm(np.diff(gt.positions, axis=0), axis=-1)
    assert steps.max() < 0.2
    assert np.abs(np.asarray(gt.positions)).max() > 1e-4


def test_smooth_trajectory_starts_at_identity():
    Rs, ts = smooth_trajectory(jax.random.PRNGKey(4), 6)
    np.testing.assert_allclose(np.asarray(Rs[0]), np.eye(3), atol=1e-7)
    np.testing.assert_allclose(np.asarray(ts[0]), 0.0, atol=1e-7)
    # Orthonormality preserved along the chain.
    err = np.abs(np.asarray(Rs[-1] @ Rs[-1].T) - np.eye(3)).max()
    assert err < 1e-5


# ---------------- domain randomization (round 4) ----------------

def test_domain_textures_differ_and_consistency_holds():
    """Domains A and B draw disjoint texture statistics, and the
    geometric cross-view consistency is domain-independent (camera
    effects are applied OUTSIDE the renderer)."""
    H, W = 48, 64
    intr = Intrinsics(jnp.array([0.9 * W]), jnp.array([0.9 * W]),
                      jnp.array([W / 2.0]), jnp.array([H / 2.0]))
    key = jax.random.PRNGKey(3)
    imgs = {}
    for dom in ("A", "B"):
        render, _ = make_plane_scene(key, num_planes=3, domain=dom)
        rgb, d = render(jnp.eye(3), jnp.zeros(3), intr, H, W)
        assert bool(jnp.all(jnp.isfinite(rgb)))
        assert bool(jnp.all(d > 0))
        imgs[dom] = np.asarray(rgb)
    # Same world key, different domains -> genuinely different images.
    assert np.abs(imgs["A"] - imgs["B"]).mean() > 5.0
    # B is the low-contrast domain by construction.
    assert imgs["B"].std() < imgs["A"].std()


def test_camera_effects_stay_in_range_and_differ_per_frame():
    from banet_tpu.data.synthetic import apply_camera_effects

    rgb = 127.5 * jnp.ones((32, 40, 3))
    a = apply_camera_effects(jax.random.PRNGKey(0), rgb, "B")
    b = apply_camera_effects(jax.random.PRNGKey(1), rgb, "B")
    for x in (a, b):
        assert float(x.min()) >= 0.0 and float(x.max()) <= 255.0
    assert float(jnp.abs(a - b).mean()) > 0.5  # per-frame draws differ


def test_rolling_shutter_zero_is_exact_and_nonzero_skews():
    H, W = 48, 64
    intr = Intrinsics(jnp.array([0.9 * W]), jnp.array([0.9 * W]),
                      jnp.array([W / 2.0]), jnp.array([H / 2.0]))
    render, _ = make_plane_scene(jax.random.PRNGKey(1), num_planes=3)
    R = exp_so3(jnp.array([[0.01, 0.0, 0.0]]))[0]
    t = jnp.array([0.01, 0.0, 0.0])
    base, dbase = render(R, t, intr, H, W)
    z0, dz0 = render(R, t, intr, H, W, shutter_w=jnp.zeros(3),
                     shutter_v=jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(z0), np.asarray(base),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(dz0), np.asarray(dbase),
                               atol=1e-5)
    sk, _ = render(R, t, intr, H, W, shutter_w=jnp.array([0.02, 0, 0]),
                   shutter_v=jnp.zeros(3))
    diff = np.abs(np.asarray(sk) - np.asarray(base)).mean(axis=(1, 2))
    mid = diff[H // 2 - 2:H // 2 + 2].mean()
    edges = (diff[:4].mean() + diff[-4:].mean()) / 2
    # Pose is nominal at the center row; skew grows toward the edges.
    assert edges > 2 * mid + 0.5, (mid, edges)


def test_step_scale_makes_segment_faster():
    F = 20
    scale = np.ones(F)
    scale[10:14] = 8.0
    Rs, ts = smooth_trajectory(jax.random.PRNGKey(2), F,
                               step_rot=0.01, step_trans=0.01,
                               step_scale=scale)
    from banet_tpu.geometry.se3 import rotation_geodesic_angle
    dang = np.asarray(rotation_geodesic_angle(Rs[:-1], Rs[1:]))
    assert dang[10:13].mean() > 4 * dang[:9].mean()


def test_pair_with_domain_shapes_and_gt():
    pair = make_plane_scene_pair(jax.random.PRNGKey(4), batch=2,
                                 height=48, width=64, domain="A")
    assert pair["image1"].shape == (2, 48, 64, 3)
    assert bool(jnp.all(jnp.isfinite(pair["image1"])))
    assert bool(jnp.all(jnp.isfinite(pair["image2"])))
    assert bool(jnp.all(pair["depth"] > 0))


def test_rendered_sequence_with_domain_and_contrast(tmp_path):
    contrast = np.ones(4)
    contrast[2] = 0.05
    seq = write_rendered_sequence(
        str(tmp_path / "seq"), num_frames=4, size=(32, 40), seed=5,
        domain="B", frame_contrast=contrast)
    assert len(seq.frames) == 4
    imgs = [np.asarray(seq.frames[i].load_rgb()).astype(np.float32)
            for i in range(4)]
    # The contrast-collapsed frame loses TEXTURE (what tracking feeds
    # on): compare high-frequency energy — the domain's vignette/
    # gradient/noise still contribute low-frequency std to every frame.
    def hf(img):
        return np.abs(np.diff(img, axis=1)).mean()

    assert hf(imgs[2]) < 0.5 * hf(imgs[1]), (hf(imgs[2]), hf(imgs[1]))
