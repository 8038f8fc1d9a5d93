"""Multi-keyframe window BA: keyframe-pose Jacobian vs autodiff,
joint recovery on a synthetic two-keyframe window, and gauge pinning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from banet_tpu.ba.multi_window_ba import (MultiWindowProblem, pair_blocks,
                                          solve_multi_window_ba)
from banet_tpu.config import SolverConfig
from banet_tpu.data.synthetic import smooth_feature_map
from banet_tpu.geometry.camera import Intrinsics, backproject, warp_points
from banet_tpu.geometry.se3 import (exp_so3, invert, compose,
                                    rotation_geodesic_angle, se3_update)
from banet_tpu.ops.grad2d import append_spatial_gradient
from banet_tpu.ops.resample import bilinear_sample

CFG = SolverConfig()


def test_keyframe_pose_jacobian_matches_autodiff():
    # The (keyframe m, frame f) observation's Jacobian wrt the keyframe
    # pose must equal jacfwd of the actual projection under the solver's
    # left-composed perturbation.
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    N, C, H, W = 32, 4, 48, 64
    intr = Intrinsics(jnp.array([50.0]), jnp.array([50.0]),
                      jnp.array([W / 2.0]), jnp.array([H / 2.0]))
    rays = backproject(
        jnp.stack([jax.random.uniform(ks[0], (1, N), minval=10, maxval=54),
                   jax.random.uniform(ks[1], (1, N), minval=10, maxval=38)],
                  axis=-1), intr, normalized=False)[0]
    depth = jax.random.uniform(ks[2], (N,), minval=2.0, maxval=4.0)
    R_f = exp_so3(0.1 * jax.random.normal(ks[3], (3,))[None])[0]
    t_f = jnp.array([0.05, -0.02, 0.1])
    R_m = exp_so3(0.1 * jax.random.normal(ks[4], (3,))[None])[0]
    t_m = jnp.array([-0.03, 0.04, 0.02])

    def proj_of_delta_m(delta):
        Rm2, tm2 = se3_update(R_m[None], t_m[None], delta[None])
        Rm2, tm2 = Rm2[0], tm2[0]
        X_m = rays * depth[:, None]
        R_rel = R_f @ Rm2.T
        t_rel = t_f - R_rel @ tm2
        X_f = X_m @ R_rel.T + t_rel[None, :]
        x = X_f[:, 0] / X_f[:, 2]
        y = X_f[:, 1] / X_f[:, 2]
        return jnp.stack([intr.fx[0] * x + intr.cx[0],
                          intr.fy[0] * y + intr.cy[0]], axis=-1)

    J_auto = jax.jacfwd(proj_of_delta_m)(jnp.zeros(6))  # (N, 2, 6)

    # Analytic Jm through pair_blocks' internals: reconstruct directly.
    from banet_tpu.ba.multi_window_ba import _hat, _proj_jacobian
    X_m = rays * depth[:, None]
    R_rel = R_f @ R_m.T
    t_rel = t_f - R_rel @ t_m
    X_f = X_m @ R_rel.T + t_rel[None, :]
    x = X_f[:, 0] / X_f[:, 2]
    y = X_f[:, 1] / X_f[:, 2]
    Jp = _proj_jacobian(x, y, X_f[:, 2], intr.fx[0], intr.fy[0])
    RJp = Jp @ R_rel
    Jm = jnp.concatenate([RJp @ _hat(X_m), -RJp], axis=-1)
    np.testing.assert_allclose(np.asarray(Jm), np.asarray(J_auto),
                               rtol=1e-4, atol=1e-4)


def two_keyframe_problem(key, F=3, H=64, W=80, C=8, N=192, K=4,
                         motion=0.015):
    """Planar scene seen by 2 keyframes and F frames, all with GT poses
    (cam-from-window); every frame rendered from the same smooth field."""
    ks = jax.random.split(key, 10)
    intr = Intrinsics(jnp.array([0.8 * W]), jnp.array([0.8 * W]),
                      jnp.array([W / 2.0]), jnp.array([H / 2.0]))
    plane_depth = 3.0
    field = smooth_feature_map(ks[0], (1, H, W, C))

    # GT poses (cam-from-window): keyframe 0 at origin.
    M = 2
    Rk = jnp.concatenate([jnp.eye(3)[None],
                          exp_so3(motion * jax.random.normal(ks[1], (1, 3)))])
    tk = jnp.concatenate([jnp.zeros((1, 3)),
                          motion * jax.random.normal(ks[2], (1, 3))])
    Rf = exp_so3(motion * jax.random.normal(ks[3], (F, 3)))
    tf = motion * jax.random.normal(ks[4], (F, 3))

    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    grid = jnp.stack([xx.ravel(), yy.ravel()], axis=-1)[None]
    grid_rays = backproject(grid, intr, normalized=False)

    def render(R_cw, t_cw):
        """View from pose (cam-from-window): inverse-warp the window
        plane field (the field lives on the window-origin camera at the
        plane depth)."""
        Rinv, tinv = invert(R_cw[None], t_cw[None])
        gx, gy, *_ = warp_points(grid_rays,
                                 jnp.full((1, H * W), plane_depth),
                                 Rinv, tinv, intr)
        return bilinear_sample(field, gx, gy).reshape(1, H, W, C)

    # Keyframe data: points + per-keyframe plane depth along their rays.
    ref_feats, rays_all, d0, basis = [], [], [], []
    for m in range(M):
        kx = jax.random.uniform(ks[5 + m], (1, N), minval=0.25 * W,
                                maxval=0.75 * W)
        ky = jax.random.uniform(ks[7 + m], (1, N), minval=0.25 * H,
                                maxval=0.75 * H)
        pts = jnp.stack([kx, ky], axis=-1)
        rays = backproject(pts, intr, normalized=False)[0]
        kf_img = render(Rk[m], tk[m])
        ref_feats.append(bilinear_sample(kf_img, pts[..., 0],
                                         pts[..., 1])[0])
        rays_all.append(rays)
        # GT depth of the plane along each keyframe ray: the plane is
        # z = plane_depth in WINDOW coords; keyframe cam at (Rk, tk):
        # window point Xw = Rk^T (ray d - tk); solve Xw_z = plane_depth.
        Rinv, tinv = invert(Rk[m][None], tk[m][None])
        # d such that (Rinv @ (rays d) + tinv)_z = plane_depth
        rz = (rays @ Rinv[0].T)[:, 2]
        d_true = (plane_depth - tinv[0, 2]) / rz
        d0.append(d_true)
        basis.append(0.3 * jax.random.normal(ks[9], (N, K)))
    tgt_fg = jnp.concatenate(
        [append_spatial_gradient(render(Rf[f], tf[f])) for f in range(F)])

    prob = MultiWindowProblem(
        ref_feats=jnp.stack(ref_feats), rays=jnp.stack(rays_all),
        init_depth=jnp.stack(d0), basis=jnp.stack(basis),
        tgt_fg=tgt_fg, obs_mask=jnp.ones((M, F)))
    return prob, intr, Rk, tk, Rf, tf


def test_joint_recovery_two_keyframes():
    prob, intr, Rk, tk, Rf, tf = two_keyframe_problem(
        jax.random.PRNGKey(1))
    F = prob.tgt_fg.shape[0]
    # Start all poses at identity; GT depths, W*=0 at the true geometry.
    Rs_f, ts_f, Rs_k, ts_k, Ws, hist = solve_multi_window_ba(
        prob, intr, CFG, num_iters=16, lam=1e-4, lam_depth=10.0)

    ang0 = rotation_geodesic_angle(
        jnp.broadcast_to(jnp.eye(3), (F, 3, 3)), Rf)
    ang = rotation_geodesic_angle(Rs_f, Rf)
    assert float(ang.max()) < float(ang0.max()) / 3, (ang, ang0)
    terr0 = jnp.linalg.norm(tf, axis=-1)
    terr = jnp.linalg.norm(ts_f - tf, axis=-1)
    assert float(terr.max()) < float(terr0.max()) / 2, (terr, terr0)

    # Keyframe 1's pose recovered too (cross-keyframe consistency).
    kang0 = float(rotation_geodesic_angle(jnp.eye(3), Rk[1]))
    kang = float(rotation_geodesic_angle(Rs_k[1], Rk[1]))
    kterr0 = float(jnp.linalg.norm(tk[1]))
    kterr = float(jnp.linalg.norm(ts_k[1] - tk[1]))
    assert kang < kang0 / 2, (kang, kang0)
    assert kterr < kterr0 / 2, (kterr, kterr0)

    # Residual history decreases.
    assert float(hist[-1]) < float(hist[0])


def test_gauge_keyframe_pinned():
    prob, intr, *_ = two_keyframe_problem(jax.random.PRNGKey(2), F=2,
                                          N=96)
    Rs_f, ts_f, Rs_k, ts_k, Ws, _ = solve_multi_window_ba(
        prob, intr, CFG, num_iters=3, lam=1e-3, lam_depth=10.0)
    np.testing.assert_allclose(np.asarray(Rs_k[0]), np.eye(3), atol=1e-7)
    np.testing.assert_allclose(np.asarray(ts_k[0]), 0.0, atol=1e-7)


def test_obs_mask_gates_pairs():
    prob, intr, *_ = two_keyframe_problem(jax.random.PRNGKey(3), F=2,
                                          N=96)
    # Masking keyframe 1 out of every frame must equal a problem where
    # keyframe 1's data is garbage (its contributions are zeroed).
    mask = prob.obs_mask.at[1, :].set(0.0)
    prob_masked = prob._replace(obs_mask=mask)
    junk = prob._replace(
        obs_mask=mask,
        ref_feats=prob.ref_feats.at[1].set(1e3),
        init_depth=prob.init_depth.at[1].set(77.0))
    out_a = solve_multi_window_ba(prob_masked, intr, CFG, num_iters=2,
                                  lam=1e-3, lam_depth=10.0)
    out_b = solve_multi_window_ba(junk, intr, CFG, num_iters=2,
                                  lam=1e-3, lam_depth=10.0)
    np.testing.assert_allclose(np.asarray(out_a[0]), np.asarray(out_b[0]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_a[1]), np.asarray(out_b[1]),
                               atol=1e-6)


@pytest.mark.multichip
def test_sharded_multi_matches_single_device():
    from banet_tpu.ba.multi_window_ba import multi_window_ba_step
    from banet_tpu.parallel.mesh import make_mesh
    from banet_tpu.parallel.multi_window_ba import \
        sharded_multi_window_ba_step

    prob, intr, Rk, tk, Rf, tf = two_keyframe_problem(
        jax.random.PRNGKey(7), F=8, N=96)
    M = prob.ref_feats.shape[0]
    F = prob.tgt_fg.shape[0]
    K = prob.basis.shape[-1]
    Rs_f0 = jnp.broadcast_to(jnp.eye(3), (F, 3, 3))
    ts_f0 = jnp.zeros((F, 3))
    Rs_k0 = jnp.broadcast_to(jnp.eye(3), (M, 3, 3))
    ts_k0 = jnp.zeros((M, 3))
    Ws0 = jnp.zeros((M, K))

    def damping_fn(avg_r):
        return jnp.linalg.norm(avg_r, axis=-1) ** 2

    a = multi_window_ba_step(prob, Rs_f0, ts_f0, Rs_k0, ts_k0, Ws0,
                             intr, 1e-3, CFG, 10.0, damping_fn)
    mesh = make_mesh(data=1, frame=8)
    b = sharded_multi_window_ba_step(mesh, prob, Rs_f0, ts_f0, Rs_k0,
                                     ts_k0, Ws0, intr, 1e-3, CFG, 10.0,
                                     damping_fn)
    # f32 psum-vs-local reduction order amplified through the dense
    # solve; the tolerance is far below any semantic divergence.
    for x, y, atol in [(a[0], b[0], 5e-5), (a[1], b[1], 5e-5),
                       (a[2], b[2], 5e-5), (a[3], b[3], 5e-5),
                       (a[4], b[4], 2e-4)]:
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=atol)


@pytest.mark.multichip
def test_sharded_multi_single_fused_psum():
    import re

    from banet_tpu.parallel.mesh import make_mesh
    from banet_tpu.parallel.multi_window_ba import \
        sharded_multi_window_ba_step

    prob, intr, *_ = two_keyframe_problem(jax.random.PRNGKey(8), F=8,
                                          N=64, C=4, K=4)
    M = prob.ref_feats.shape[0]
    F = prob.tgt_fg.shape[0]
    K = prob.basis.shape[-1]
    mesh = make_mesh(data=1, frame=8)
    fn = jax.jit(lambda p, a, b, c, d, e: sharded_multi_window_ba_step(
        mesh, p, a, b, c, d, e, intr, 1e-3, CFG, 10.0))
    hlo = fn.lower(prob, jnp.broadcast_to(jnp.eye(3), (F, 3, 3)),
                   jnp.zeros((F, 3)),
                   jnp.broadcast_to(jnp.eye(3), (M, 3, 3)),
                   jnp.zeros((M, 3)),
                   jnp.zeros((M, K))).compile().as_text()
    collectives = re.findall(
        r"(all-reduce|all-gather|reduce-scatter|collective-permute"
        r"|all-to-all)", hlo)
    # One fused psum -> O(1) all-reduces (XLA may split the tuple into
    # one all-reduce per operand, 7 here) and nothing else.
    assert 1 <= len(collectives) <= 10, collectives
    assert all(c == "all-reduce" for c in collectives), collectives


def test_multi_window_reject_never_worsens_warm_start():
    """Same Levenberg accept/reject contract as the single-keyframe
    solver (round-5, VERDICT r4 item 3b): from a warm start, the joint
    multi-keyframe solve must not return a state whose residual
    exceeds the warm start's, even under near-zero damping where
    unguarded GN overshoots — the failure mode that made multi-mode
    window BA score worse than no window in round 4."""
    import dataclasses

    from banet_tpu.ba.multi_window_ba import multi_window_ba_step

    prob, intr, Rk, tk, Rf, tf = two_keyframe_problem(
        jax.random.PRNGKey(5), motion=0.06)
    F = prob.tgt_fg.shape[0]
    M = 2
    K = prob.basis.shape[-1]

    def residual_at(Rs_f, ts_f, Rs_k, ts_k, Ws):
        *_, res = multi_window_ba_step(prob, Rs_f, ts_f, Rs_k, ts_k,
                                       Ws, intr, 1e-3, CFG, 1.0)
        return float(res)

    # Warm start: the TRUE poses lightly perturbed (tracked-pose error
    # model) — already close to the optimum.
    keyp = jax.random.PRNGKey(6)
    dR = exp_so3(0.01 * jax.random.normal(keyp, (F, 3)))
    Rf0 = jnp.einsum("fij,fjk->fik", dR, Rf)
    tf0 = tf + 0.01 * jax.random.normal(jax.random.fold_in(keyp, 1),
                                        (F, 3))
    res0 = residual_at(Rf0, tf0, Rk, tk, jnp.zeros((M, K)))

    Rs_f, ts_f, Rs_k, ts_k, Ws, _ = solve_multi_window_ba(
        prob, intr, CFG, num_iters=5, lam=1e-8, lam_depth=1e-8,
        Rs_f0=Rf0, ts_f0=tf0, Rs_k0=Rk, ts_k0=tk)
    res_rej = residual_at(Rs_f, ts_f, Rs_k, ts_k, Ws)
    assert res_rej <= res0 * (1.0 + 1e-5), (res_rej, res0)

    cfg_off = dataclasses.replace(CFG, window_reject_bad_steps=False)
    Ru, tu, Rku, tku, Wu, _ = solve_multi_window_ba(
        prob, intr, cfg_off, num_iters=5, lam=1e-8, lam_depth=1e-8,
        Rs_f0=Rf0, ts_f0=tf0, Rs_k0=Rk, ts_k0=tk)
    res_ung = residual_at(Ru, tu, Rku, tku, Wu)
    assert res_rej <= res_ung * (1.0 + 1e-5), (res_rej, res_ung)
