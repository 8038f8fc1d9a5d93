"""Window BA: convergence, and single-device vs frame-sharded parity on
the virtual 8-device CPU mesh (SURVEY.md §4(d))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from banet_tpu.ba.window_ba import solve_window_ba, window_ba_step
from banet_tpu.config import SolverConfig
from banet_tpu.data.synthetic import smooth_feature_map
from banet_tpu.geometry.camera import Intrinsics, backproject, warp_points
from banet_tpu.geometry.se3 import exp_so3, rotation_geodesic_angle
from banet_tpu.ops.grad2d import append_spatial_gradient
from banet_tpu.ops.resample import bilinear_sample
from banet_tpu.parallel.mesh import make_mesh
from banet_tpu.parallel.window_ba import sharded_window_ba_step

CFG = SolverConfig()


def planar_window_problem(key, F=4, H=64, W=80, C=8, N=256, K=6,
                          motion=0.02):
    """Window problem on a planar scene with an exact-ish optimum.

    One smooth keyframe feature field; each of the F target frames is
    rendered by inverse-warping that field through its ground-truth
    pose at the plane depth.  Keyframe point features are the field
    sampled at the points, so at the true poses (with depth = plane)
    the residuals vanish up to resampling error.  A K-channel basis is
    included so the shared-W plumbing and Schur elimination are
    exercised.
    """
    ks = jax.random.split(key, 8)
    intr = Intrinsics(jnp.array([0.8 * W]), jnp.array([0.8 * W]),
                      jnp.array([W / 2.0]), jnp.array([H / 2.0]))
    px = jax.random.uniform(ks[0], (1, N), minval=0.25 * W, maxval=0.75 * W)
    py = jax.random.uniform(ks[1], (1, N), minval=0.25 * H, maxval=0.75 * H)
    points = jnp.stack([px, py], axis=-1)
    rays = backproject(points, intr, normalized=True)[0]

    plane_depth = 3.0
    basis_map = 0.3 * smooth_feature_map(ks[3], (1, H, W, K))
    basis = bilinear_sample(basis_map, points[..., 0], points[..., 1])[0]

    w_all = motion * jax.random.normal(ks[5], (F, 3))
    R_true = exp_so3(w_all)
    t_true = motion * jax.random.normal(ks[6], (F, 3))

    field = smooth_feature_map(ks[7], (1, H, W, C))
    ref_feats = bilinear_sample(field, points[..., 0], points[..., 1])[0]

    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    grid = jnp.stack([xx.ravel(), yy.ravel()], axis=-1)[None]
    grid_rays = backproject(grid, intr, normalized=True)

    tgt_fgs = []
    for f in range(F):
        Rinv = R_true[f].T
        tinv = -Rinv @ t_true[f]
        gx, gy, *_ = warp_points(grid_rays,
                                 jnp.full((1, H * W), plane_depth),
                                 Rinv[None], tinv[None], intr)
        tf = bilinear_sample(field, gx, gy).reshape(1, H, W, C)
        tgt_fgs.append(append_spatial_gradient(tf)[0])

    return dict(intr=intr, rays=rays, ref_feats=ref_feats,
                tgt_fgs=jnp.stack(tgt_fgs), basis=basis,
                R_true=R_true, t_true=t_true, plane_depth=plane_depth,
                init_depth=jnp.full((N,), plane_depth))


def test_window_ba_reduces_error():
    F = 4
    prob = planar_window_problem(jax.random.PRNGKey(0), F=F, motion=0.015)
    # lam_depth pins the monocular scale gauge (the reference's 1000x
    # bundle damping plays the same role, bundlenet.py:393); without it
    # (t_z, W) drift along the gauge null space with residuals still
    # converging.
    Rs, ts, W, res_hist = solve_window_ba(
        prob["ref_feats"], prob["tgt_fgs"], prob["rays"],
        prob["init_depth"], prob["basis"], prob["intr"], CFG,
        num_iters=6, lam=1e-3, lam_depth=1.0)
    ang0 = rotation_geodesic_angle(
        jnp.broadcast_to(jnp.eye(3), (F, 3, 3)), prob["R_true"])
    ang = rotation_geodesic_angle(Rs, prob["R_true"])
    assert float(ang.max()) < float(ang0.max()) / 3, (ang, ang0)
    terr0 = jnp.linalg.norm(prob["t_true"], axis=-1)
    terr = jnp.linalg.norm(ts - prob["t_true"], axis=-1)
    assert float(terr.max()) < float(terr0.max()) / 2, (terr, terr0)
    assert float(res_hist[-1].mean()) < float(res_hist[0].mean())


def test_frame_mask_ignores_padded_frames():
    # Padding a short window by repeating the last frame (the odometry
    # runner's static-shape trick) must NOT change the solution when the
    # padded frames are masked out: the masked F=4 solve has to equal
    # the unpadded F=2 solve exactly.
    prob = planar_window_problem(jax.random.PRNGKey(3), F=2, motion=0.015)
    Rs2, ts2, W2, _ = solve_window_ba(
        prob["ref_feats"], prob["tgt_fgs"], prob["rays"],
        prob["init_depth"], prob["basis"], prob["intr"], CFG,
        num_iters=4, lam=1e-3, lam_depth=1.0)

    tgt_padded = jnp.concatenate(
        [prob["tgt_fgs"], prob["tgt_fgs"][-1:], prob["tgt_fgs"][-1:]])
    mask = jnp.array([1.0, 1.0, 0.0, 0.0])
    Rs4, ts4, W4, _ = solve_window_ba(
        prob["ref_feats"], tgt_padded, prob["rays"],
        prob["init_depth"], prob["basis"], prob["intr"], CFG,
        num_iters=4, lam=1e-3, lam_depth=1.0, frame_mask=mask)

    np.testing.assert_allclose(np.asarray(Rs4[:2]), np.asarray(Rs2),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ts4[:2]), np.asarray(ts2),
                               atol=1e-6)
    # f32 reduction-order noise between the F=2 and F=4 einsum trees.
    np.testing.assert_allclose(np.asarray(W4), np.asarray(W2), atol=1e-5)
    # Masked frames' poses stay at the identity init.
    np.testing.assert_allclose(np.asarray(Rs4[2:]),
                               np.broadcast_to(np.eye(3), (2, 3, 3)),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ts4[2:]), 0.0, atol=1e-6)

    # Unmasked padding is NOT equivalent (the double-count the mask
    # exists to prevent) — guard against the mask silently becoming a
    # no-op.
    Rs_np, ts_np, W_np, _ = solve_window_ba(
        prob["ref_feats"], tgt_padded, prob["rays"],
        prob["init_depth"], prob["basis"], prob["intr"], CFG,
        num_iters=4, lam=1e-3, lam_depth=1.0)
    assert float(jnp.abs(W_np - W2).max()) > 1e-4


def test_frame_mask_with_learned_damping():
    prob = planar_window_problem(jax.random.PRNGKey(4), F=2, motion=0.01)

    def damping_fn(avg_r):
        return jnp.linalg.norm(avg_r, axis=-1) ** 2

    Rs2, ts2, W2, _ = solve_window_ba(
        prob["ref_feats"], prob["tgt_fgs"], prob["rays"],
        prob["init_depth"], prob["basis"], prob["intr"], CFG,
        num_iters=3, lam=1e-2, lam_depth=10.0, damping_fn=damping_fn)
    tgt_padded = jnp.concatenate([prob["tgt_fgs"], prob["tgt_fgs"][:1]])
    Rs3, ts3, W3, _ = solve_window_ba(
        prob["ref_feats"], tgt_padded, prob["rays"],
        prob["init_depth"], prob["basis"], prob["intr"], CFG,
        num_iters=3, lam=1e-2, lam_depth=10.0, damping_fn=damping_fn,
        frame_mask=jnp.array([1.0, 1.0, 0.0]))
    # The lambda path squares/sums residual stats, amplifying f32
    # reduction-order noise; the unmasked double-count this guards
    # against is orders of magnitude larger.
    np.testing.assert_allclose(np.asarray(Rs3[:2]), np.asarray(Rs2),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(W3), np.asarray(W2), atol=1e-4)


@pytest.mark.multichip
def test_sharded_frame_mask_matches_single_device():
    F = 8
    prob = planar_window_problem(jax.random.PRNGKey(5), F=F, motion=0.01)
    K = prob["basis"].shape[-1]
    Rs0 = jnp.broadcast_to(jnp.eye(3), (F, 3, 3))
    ts0 = jnp.zeros((F, 3))
    W0 = jnp.zeros((K,))
    mask = jnp.array([1.0, 1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0])

    def damping_fn(avg_r):
        return jnp.linalg.norm(avg_r, axis=-1) ** 2

    R1, t1, W1, _ = window_ba_step(
        prob["ref_feats"], prob["tgt_fgs"], prob["rays"],
        prob["init_depth"], prob["basis"], Rs0, ts0, W0, prob["intr"],
        1e-2, CFG, 10.0, damping_fn, frame_mask=mask)
    mesh = make_mesh(data=1, frame=8)
    R2, t2, W2, _ = sharded_window_ba_step(
        mesh, prob["ref_feats"], prob["tgt_fgs"], prob["rays"],
        prob["init_depth"], prob["basis"], Rs0, ts0, W0, prob["intr"],
        1e-2, CFG, 10.0, damping_fn, frame_mask=mask)
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(W1), np.asarray(W2), atol=1e-4)


@pytest.mark.multichip
def test_sharded_matches_single_device():
    F = 8
    prob = planar_window_problem(jax.random.PRNGKey(1), F=F, motion=0.01)
    K = prob["basis"].shape[-1]
    Rs0 = jnp.broadcast_to(jnp.eye(3), (F, 3, 3))
    ts0 = jnp.zeros((F, 3))
    W0 = jnp.zeros((K,))

    R1, t1, W1, res1 = window_ba_step(
        prob["ref_feats"], prob["tgt_fgs"], prob["rays"],
        prob["init_depth"], prob["basis"], Rs0, ts0, W0, prob["intr"],
        1e-3, CFG)

    mesh = make_mesh(data=1, frame=8)
    R2, t2, W2, res2 = sharded_window_ba_step(
        mesh, prob["ref_feats"], prob["tgt_fgs"], prob["rays"],
        prob["init_depth"], prob["basis"], Rs0, ts0, W0, prob["intr"],
        1e-3, CFG)

    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(W1), np.asarray(W2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(res1), np.asarray(res2),
                               atol=1e-5)


@pytest.mark.multichip
def test_sharded_learned_damping_matches():
    from banet_tpu.ba.window_ba import window_ba_step

    F = 8
    prob = planar_window_problem(jax.random.PRNGKey(2), F=F, motion=0.01)
    K = prob["basis"].shape[-1]
    Rs0 = jnp.broadcast_to(jnp.eye(3), (F, 3, 3))
    ts0 = jnp.zeros((F, 3))
    W0 = jnp.zeros((K,))

    def damping_fn(avg_r):
        return jnp.linalg.norm(avg_r, axis=-1) ** 2

    R1, t1, W1, _ = window_ba_step(
        prob["ref_feats"], prob["tgt_fgs"], prob["rays"],
        prob["init_depth"], prob["basis"], Rs0, ts0, W0, prob["intr"],
        1e-2, CFG, 10.0, damping_fn)
    mesh = make_mesh(data=1, frame=8)
    R2, t2, W2, _ = sharded_window_ba_step(
        mesh, prob["ref_feats"], prob["tgt_fgs"], prob["rays"],
        prob["init_depth"], prob["basis"], Rs0, ts0, W0, prob["intr"],
        1e-2, CFG, 10.0, damping_fn)
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(W1), np.asarray(W2), atol=1e-4)


def test_window_reject_never_worsens_warm_start():
    """The Levenberg accept/reject contract (round-5, VERDICT r4 item
    3b): whatever the damping does, the returned state's residual must
    not exceed the warm start's — unguarded aggressive GN (tiny lam,
    large motion) can overshoot and hand back something WORSE than its
    initialization, which is exactly how multi-keyframe window BA lost
    to no-window in round 4."""
    import dataclasses

    prob = planar_window_problem(jax.random.PRNGKey(9), F=4,
                                 motion=0.08)

    def residual_at(Rs, ts, W):
        _, _, _, res = window_ba_step(
            prob["ref_feats"], prob["tgt_fgs"], prob["rays"],
            prob["init_depth"], prob["basis"], Rs, ts, W,
            prob["intr"], 1e-3, CFG, 1.0)
        return float(jnp.mean(res))

    F = 4
    Rs0 = jnp.broadcast_to(jnp.eye(3), (F, 3, 3))
    ts0 = jnp.zeros((F, 3))
    res0 = residual_at(Rs0, ts0, jnp.zeros(prob["basis"].shape[-1]))

    # Aggressive solve: near-zero damping invites overshoot.
    Rs, ts, W, _ = solve_window_ba(
        prob["ref_feats"], prob["tgt_fgs"], prob["rays"],
        prob["init_depth"], prob["basis"], prob["intr"], CFG,
        num_iters=6, lam=1e-7, lam_depth=1e-7)
    res_rej = residual_at(Rs, ts, W)
    assert res_rej <= res0 * (1.0 + 1e-5), (res_rej, res0)

    # And the guard is live: with rejection disabled the same solve is
    # allowed to end worse than it started (if it doesn't on this
    # fixture, the assertion above still pinned the contract).
    cfg_off = dataclasses.replace(CFG, window_reject_bad_steps=False)
    Rs_u, ts_u, W_u, _ = solve_window_ba(
        prob["ref_feats"], prob["tgt_fgs"], prob["rays"],
        prob["init_depth"], prob["basis"], prob["intr"], cfg_off,
        num_iters=6, lam=1e-7, lam_depth=1e-7)
    res_ung = residual_at(Rs_u, ts_u, W_u)
    # Rejection never does worse than the unguarded solve.
    assert res_rej <= res_ung * (1.0 + 1e-5), (res_rej, res_ung)
