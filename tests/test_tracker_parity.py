"""Cached-keyframe vs cold-pair tracking parity, and dynamic early-exit
vs masked-scan equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from banet_tpu.ba.camera_solver import solve_pose_level
from banet_tpu.config import Config, ModelConfig, SolverConfig
from banet_tpu.data.synthetic import make_two_view_problem
from banet_tpu.ops.grad2d import append_spatial_gradient


@pytest.mark.slow
def test_cached_equals_cold_pair():
    from banet_tpu.tracking import TwoViewTracker

    cfg = Config(model=ModelConfig(backbone="drn22",
                                   compute_dtype="float32"),
                 solver=SolverConfig(level_iters=(1, 1, 1, 1)))
    tr = TwoViewTracker.initialize(cfg, image_size=(64, 96),
                                   num_points=16)
    rng = np.random.default_rng(0)
    img1 = (255.0 * rng.random((64, 96, 3))).astype(np.float32)
    img2 = (255.0 * rng.random((64, 96, 3))).astype(np.float32)
    pts = (rng.random((16, 2)) * np.array([80.0, 48.0]) + 8).astype(
        np.float32)
    d = np.full((16,), 2.0, np.float32)
    k = [80.0, 80.0, 48.0, 32.0]

    R1, t1, keep1 = tr.track(img1, img2, k, pts, d)
    tr.set_keyframe(img1, k, pts, d)
    R2, t2, keep2 = tr.track_frame(img2)

    np.testing.assert_allclose(R1, R2, atol=1e-5)
    np.testing.assert_allclose(t1, t2, atol=1e-5)
    np.testing.assert_allclose(keep1, keep2, atol=1e-6)


def test_dynamic_early_exit_matches_scan():
    prob = make_two_view_problem(jax.random.PRNGKey(0), batch=2,
                                 num_points=256)
    tgt_fg = append_spatial_gradient(prob["tgt_feats"])
    R0 = jnp.broadcast_to(jnp.eye(3), (2, 3, 3))
    t0 = jnp.zeros((2, 3))
    damping = lambda a: jnp.full(a.shape[:-1], 1e-4)  # noqa: E731

    cfg_scan = SolverConfig(early_termination=True,
                            dynamic_early_exit=False)
    cfg_dyn = SolverConfig(early_termination=True,
                           dynamic_early_exit=True)
    Ra, ta, auxa = solve_pose_level(
        prob["ref_feats"], tgt_fg, prob["rays"], prob["depth"], R0, t0,
        prob["intr"], damping, 15, cfg_scan)
    Rb, tb, auxb = solve_pose_level(
        prob["ref_feats"], tgt_fg, prob["rays"], prob["depth"], R0, t0,
        prob["intr"], damping, 15, cfg_dyn)
    np.testing.assert_allclose(np.asarray(Ra), np.asarray(Rb), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ta), np.asarray(tb), atol=1e-6)

    # And the dynamic mode jits.
    f = jax.jit(lambda R, t: solve_pose_level(
        prob["ref_feats"], tgt_fg, prob["rays"], prob["depth"], R, t,
        prob["intr"], damping, 15, cfg_dyn)[0])
    np.testing.assert_allclose(np.asarray(f(R0, t0)), np.asarray(Rb),
                               atol=1e-6)
