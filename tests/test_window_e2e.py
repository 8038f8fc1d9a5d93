"""End-to-end keyframe-window BA through the flagship model (BASELINE
configs #2/#3 shape): network depth/basis + learned damping + Schur
solve over F frames."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from banet_tpu.config import Config, ModelConfig, SolverConfig
from banet_tpu.geometry.camera import Intrinsics
from banet_tpu.models.banet import BANet

H, W, F, N = 64, 96, 3, 128


@pytest.mark.slow
def test_window_bundle_adjust_runs():
    cfg = Config(
        model=ModelConfig(backbone="drn22", compute_dtype="float32"),
        solver=SolverConfig(level_iters=(1, 1, 1, 1)),
    )
    model = BANet(cfg)
    key = jax.random.PRNGKey(0)
    img_key = 255.0 * jax.random.uniform(key, (H, W, 3))
    imgs_tgt = 255.0 * jax.random.uniform(jax.random.fold_in(key, 1),
                                          (F, H, W, 3))
    intr = Intrinsics(jnp.array([80.0]), jnp.array([80.0]),
                      jnp.array([W / 2.0]), jnp.array([H / 2.0]))
    pts = jnp.stack([
        jax.random.uniform(jax.random.fold_in(key, 2), (1, N),
                           minval=8.0, maxval=W - 8.0),
        jax.random.uniform(jax.random.fold_in(key, 3), (1, N),
                           minval=8.0, maxval=H - 8.0)], axis=-1)

    # Init the full model first (shared submodules), then run the
    # window method with those params.
    variables = model.init(key, img_key[None], img_key[None], intr, pts)
    out = model.apply(variables, img_key, imgs_tgt, intr, pts,
                      num_iters=2, method=model.window_bundle_adjust)
    assert out["Rs"].shape == (F, 3, 3)
    assert out["ts"].shape == (F, 3)
    assert out["W"].shape == (32,)
    assert out["refined_depth_map"].shape == (H // 2, W // 2)
    for v in jax.tree.leaves(out):
        assert bool(jnp.all(jnp.isfinite(v)))
    # Rotations orthonormal after the joint solve.
    err = jnp.abs(out["Rs"] @ jnp.swapaxes(out["Rs"], -1, -2) -
                  jnp.eye(3)).max()
    assert float(err) < 1e-4


def test_window_ba_learned_damping_path():
    """solve_window_ba with a damping_fn converges like the scalar-lam
    path on the planar problem."""
    import sys

    sys.path.insert(0, "tests")
    from test_window_ba import CFG, planar_window_problem

    from banet_tpu.ba.window_ba import solve_window_ba
    from banet_tpu.geometry.se3 import rotation_geodesic_angle

    prob = planar_window_problem(jax.random.PRNGKey(0), F=4, C=8,
                                 motion=0.015)

    def damping_fn(avg_r):  # crude stand-in for the trained MLP
        return jnp.linalg.norm(avg_r, axis=-1) ** 2

    Rs, ts, Wc, res = solve_window_ba(
        prob["ref_feats"], prob["tgt_fgs"], prob["rays"],
        prob["init_depth"], prob["basis"], prob["intr"], CFG,
        num_iters=6, lam=1e-2, lam_depth=10.0, damping_fn=damping_fn)
    ang0 = rotation_geodesic_angle(jnp.eye(3)[None], prob["R_true"]).max()
    ang = rotation_geodesic_angle(Rs, prob["R_true"]).max()
    assert float(ang) < float(ang0) / 2, (ang, ang0)
    assert float(res[-1].mean()) < float(res[0].mean())
