"""Fused Pallas GN-iteration kernel vs the XLA scan solver (interpret
mode on CPU; the same code path compiles with Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from banet_tpu.ba.camera_solver import solve_pose_level
from banet_tpu.ba.fused_level import (solve_pose_level_fused,
                                      solve_pose_pyramid_fused)
from banet_tpu.config import SolverConfig
from banet_tpu.data.synthetic import make_two_view_problem
from banet_tpu.geometry.se3 import rotation_geodesic_angle
from banet_tpu.models.damping import DampingNet

N, C = 128, 16


def _setup(seed=0, **kw):
    prob = make_two_view_problem(jax.random.PRNGKey(seed), batch=1,
                                 num_points=N, channels=C,
                                 normalized_rays=False, **kw)
    dnet = DampingNet(C)
    dvars = dnet.init(jax.random.PRNGKey(1), jnp.zeros((1, C)))

    def damping_fn(avg_r):
        return dnet.apply(dvars, avg_r)

    return prob, dvars["params"], damping_fn


def test_fused_level_matches_scan_solver():
    prob, mlp_params, damping_fn = _setup()
    cfg = SolverConfig(reject_bad_steps=True, early_termination=True)
    R0 = jnp.eye(3)[None]
    t0 = jnp.zeros((1, 3))

    R_ref, t_ref, _aux = solve_pose_level(
        prob["ref_feats"], prob["tgt_feats"], prob["rays"],
        prob["depth"], R0, t0, prob["intr"], damping_fn, num_iters=10,
        cfg=cfg, renormalize_residual=False, footprint_hw="direct")

    R_f, t_f, state = solve_pose_level_fused(
        prob["ref_feats"][0], prob["tgt_feats"][0], prob["rays"][0],
        prob["depth"][0], jnp.eye(3), jnp.zeros(3), prob["intr"],
        mlp_params, num_iters=10, cfg=cfg, interpret=True)

    ang = float(rotation_geodesic_angle(R_f[None], R_ref)[0])
    terr = float(jnp.linalg.norm(t_f - t_ref[0]))
    # Outcome parity: both converge to the same pose; tolerances cover
    # the documented sub-threshold final-step difference.
    assert ang < 2e-3, ang
    assert terr < 2e-3, terr
    # Both must actually have converged toward GT.
    ang_gt = float(rotation_geodesic_angle(R_f[None],
                                           prob["R_true"])[0])
    ang_gt0 = float(rotation_geodesic_angle(jnp.eye(3)[None],
                                            prob["R_true"])[0])
    assert ang_gt < ang_gt0 / 5
    # State sanity: keep ratio ~1, done flag set or not but finite.
    st = np.asarray(state)[0]
    assert 0.9 < st[5] <= 1.0
    assert np.isfinite(st).all()


def test_fused_rejection_freezes():
    # residual_ratio=0 forbids acceptance after the first (entry) call:
    # the pose must stay at the init.
    prob, mlp_params, _ = _setup(seed=2)
    cfg = SolverConfig(reject_bad_steps=True, residual_ratio=0.0)
    from banet_tpu.geometry.se3 import exp_so3

    R0 = exp_so3(jnp.array([[0.0, 0.5, 0.0]]))[0]
    t0 = jnp.array([1.0, 0.0, 0.0])
    R_f, t_f, state = solve_pose_level_fused(
        prob["ref_feats"][0], prob["tgt_feats"][0], prob["rays"][0],
        prob["depth"][0], R0, t0, prob["intr"], mlp_params,
        num_iters=5, cfg=cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(R_f), np.asarray(R0),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(t_f), np.asarray(t0),
                               atol=1e-6)
    assert float(np.asarray(state)[0, 1]) == 1.0  # done


def test_fused_pyramid_converges():
    prob, mlp_params, _ = _setup(seed=3, height=64, width=80)
    # The untrained damping MLP over-damps (lam = |r|^(2+a) with |r|
    # O(1)); give the solve headroom.
    cfg = SolverConfig(level_iters=(12, 25))
    coarse = jax.image.resize(prob["tgt_feats"], (1, 32, 40, C),
                              "linear")
    from banet_tpu.geometry.camera import warp_points
    from banet_tpu.ops.resample import bilinear_sample

    intr_c = prob["intr"].scale(0.5)
    cgx, cgy, *_ = warp_points(prob["rays"], prob["depth"],
                               prob["R_true"], prob["t_true"], intr_c)
    ref_coarse = bilinear_sample(coarse, cgx, cgy)

    R, t, _state = solve_pose_pyramid_fused(
        [ref_coarse[0], prob["ref_feats"][0]],
        [coarse[0], prob["tgt_feats"][0]],
        prob["rays"][0], prob["depth"][0], jnp.eye(3), jnp.zeros(3),
        [intr_c, prob["intr"]], [mlp_params, mlp_params], cfg,
        interpret=True)
    ang0 = float(rotation_geodesic_angle(jnp.eye(3)[None],
                                         prob["R_true"])[0])
    terr0 = float(jnp.linalg.norm(prob["t_true"][0]))
    ang = float(rotation_geodesic_angle(R[None], prob["R_true"])[0])
    terr = float(jnp.linalg.norm(t - prob["t_true"][0]))
    assert ang < ang0 / 8, (ang, ang0)
    assert terr < terr0 / 4, (terr, terr0)


def test_multi_iteration_grid_matches_chained_single():
    """gn_tail_multi(K) == K sequential gn_tail_step calls (interpret
    mode) — the grid-carried pose/state revisiting is exact."""
    import numpy as np

    from banet_tpu.models.damping import DampingNet
    from banet_tpu.ops.pallas_gn_tail import (gn_tail_multi,
                                              gn_tail_step,
                                              initial_state, pack_pose)

    rng = np.random.default_rng(0)
    N, C = 64, 16
    taps = tuple(jnp.asarray(rng.normal(size=(N, C)), jnp.float32)
                 for _ in range(4))
    ref = jnp.asarray(rng.normal(size=(N, C)), jnp.float32)
    pw = (jnp.zeros((N, 8), jnp.float32).at[:, 0].set(0.3)
          .at[:, 1].set(0.6).at[:, 2].set(1.0))
    juv = jnp.asarray(0.1 * rng.normal(size=(N, 16)), jnp.float32)
    juv = juv.at[:, 6:8].set(0).at[:, 14:16].set(0)
    pose = pack_pose(jnp.eye(3), jnp.zeros(3))
    st = initial_state()
    net = DampingNet(C)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, C)))["params"]

    p1, s1 = pose, st
    for _ in range(3):
        p1, s1 = gn_tail_step(taps, ref, pw, juv, p1, s1, params,
                              interpret=True)
    p2, s2 = gn_tail_multi(taps, ref, pw, juv, pose, st, params, 3,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1),
                               rtol=1e-5, atol=1e-6)
