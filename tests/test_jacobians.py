"""Verify the analytic Jacobians against jax autodiff of the actual warp.

This is the de-risking test SURVEY.md §7 step 1 calls for: the camera
Jacobian must equal d(projection)/d(se3 delta) at delta=0, and the depth
Jacobian must equal d(projection)/d(depth), for both ray conventions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from banet_tpu.geometry import (Intrinsics, backproject, camera_jacobian,
                                depth_jacobian, se3, warp_points)


def make_problem(seed=0, n=17, normalized=True):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    intr = Intrinsics(jnp.array([100.0]), jnp.array([110.0]),
                      jnp.array([64.0]), jnp.array([48.0]))
    pts = jnp.stack([
        jax.random.uniform(k1, (1, n), minval=10.0, maxval=118.0),
        jax.random.uniform(k2, (1, n), minval=10.0, maxval=86.0),
    ], axis=-1)
    rays = backproject(pts, intr, normalized=normalized)
    depth = jax.random.uniform(k3, (1, n), minval=1.0, maxval=4.0)
    w = 0.1 * jax.random.normal(k4, (1, 3))
    R = se3.exp_so3(w)
    t = jnp.array([[0.05, -0.02, 0.1]])
    return intr, rays, depth, R, t


@pytest.mark.parametrize("normalized", [True, False])
def test_camera_jacobian_matches_autodiff(normalized):
    intr, rays, depth, R, t = make_problem(normalized=normalized)

    def proj_of_delta(delta):
        Rn, tn = se3.se3_update(R, t, delta[None])
        px, py, *_ = warp_points(rays, depth, Rn, tn, intr)
        return jnp.stack([px, py], axis=-1)[0]  # (N, 2)

    J_auto = jax.jacfwd(proj_of_delta)(jnp.zeros(6))  # (N, 2, 6)

    px, py, x, y, z, Rp = warp_points(rays, depth, R, t, intr)
    J = camera_jacobian(x, y, z, intr.fx, intr.fy)[0]  # (N, 2, 6)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_auto),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("normalized", [True, False])
def test_depth_jacobian_matches_autodiff(normalized):
    intr, rays, depth, R, t = make_problem(normalized=normalized)

    def proj_of_depth(d):
        px, py, *_ = warp_points(rays, d[None], R, t, intr)
        return jnp.stack([px, py], axis=-1)[0]  # (N, 2)

    J_auto = jax.jacfwd(proj_of_depth)(depth[0])  # (N, 2, N) diagonal
    J_auto_diag = jnp.einsum("nin->ni", J_auto)  # (N, 2)

    px, py, x, y, z, Rp = warp_points(rays, depth, R, t, intr)
    Jd = depth_jacobian(Rp, x, y, z, intr.fx, intr.fy)[0]
    np.testing.assert_allclose(np.asarray(Jd), np.asarray(J_auto_diag),
                               rtol=1e-4, atol=1e-4)


def test_backproject_conventions():
    intr = Intrinsics(jnp.array([100.0]), jnp.array([100.0]),
                      jnp.array([50.0]), jnp.array([50.0]))
    pts = jnp.array([[[50.0, 50.0], [150.0, 50.0]]])
    rays_z1 = backproject(pts, intr, normalized=False)
    np.testing.assert_allclose(np.asarray(rays_z1[0, 0]), [0, 0, 1],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(rays_z1[0, 1]), [1, 0, 1],
                               atol=1e-6)
    rays_n = backproject(pts, intr, normalized=True)
    norms = jnp.linalg.norm(rays_n, axis=-1)
    np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-6)


def test_default_ray_convention_matches_sensor_z_depth():
    """Every depth source in this framework (TUM/ScanNet PNGs, the
    synthetic renderer) is plain z-depth; the default config must
    interpret it that way.  ray * depth has to reconstruct the true 3D
    point and the warp must equal the direct pinhole projection of
    R X + t — under the normalized-ray convention this fails with a
    corner-growing bias (ADVICE r1, high)."""
    from banet_tpu.config import default_config

    cfg = default_config()
    assert cfg.geometry.normalized_rays is False

    intr = Intrinsics(jnp.array([535.4]), jnp.array([539.2]),
                      jnp.array([320.1]), jnp.array([247.6]))
    # Points including image corners, where the bias was largest.
    pts = jnp.array([[[0.0, 0.0], [639.0, 479.0], [320.0, 240.0],
                      [600.0, 30.0]]])
    z_depth = jnp.array([[1.5, 2.0, 3.0, 2.5]])
    R = se3.exp_so3(jnp.array([[0.02, -0.03, 0.01]]))
    t = jnp.array([[0.05, -0.02, 0.1]])

    rays = backproject(pts, intr, normalized=cfg.geometry.normalized_rays)
    X = rays * z_depth[..., None]  # must be the true 3D point
    np.testing.assert_allclose(np.asarray(X[..., 2]),
                               np.asarray(z_depth), rtol=1e-6)
    Xw = jnp.einsum("bij,bnj->bni", R, X) + t[:, None, :]
    u_direct = Xw[..., 0] / Xw[..., 2] * intr.fx + intr.cx
    v_direct = Xw[..., 1] / Xw[..., 2] * intr.fy + intr.cy

    px, py, *_ = warp_points(rays, z_depth, R, t, intr)
    np.testing.assert_allclose(np.asarray(px), np.asarray(u_direct),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(py), np.asarray(v_direct),
                               rtol=1e-5)


def test_crop_remap_reference_constants():
    """The generic remap must reproduce the reference magic constants
    (bundlenet.py:286-302): src (240,320) -> dst (256,320), border 4."""
    from banet_tpu.geometry import crop_adjusted_intrinsics, crop_remap

    pts = jnp.array([[[4.0, 4.0], [316.0, 236.0], [100.0, 120.0]]])
    out = crop_remap(pts, (240, 320), (256, 320), 4)
    expected_x = 320 * (pts[..., 0] - 4) / 312
    expected_y = 256 * (pts[..., 1] - 4) / 232
    np.testing.assert_allclose(np.asarray(out[..., 0]),
                               np.asarray(expected_x), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[..., 1]),
                               np.asarray(expected_y), rtol=1e-6)

    intr = Intrinsics(jnp.array([535.4]), jnp.array([539.2]),
                      jnp.array([320.1]), jnp.array([247.6]))
    adj = crop_adjusted_intrinsics(intr, (240, 320), (256, 320), 4)
    np.testing.assert_allclose(np.asarray(adj.fx), 535.4 * 40 / 39, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(adj.fy), 539.2 * 32 / 29, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(adj.cx),
                               320.1 * 40 / 39 - 160.0 / 39, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(adj.cy),
                               247.6 * 32 / 29 - 128.0 / 29, rtol=1e-6)
