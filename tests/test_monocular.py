"""Monocular (no sensor depth) tracking path."""

import numpy as np
import pytest

from banet_tpu.data.points import select_textured_points


def test_select_textured_points():
    img = np.zeros((32, 48, 3), np.float32)
    img[:, 24:, :] = 255.0
    pts = select_textured_points(img, 40, texture_threshold=100.0,
                                 rng=np.random.default_rng(0))
    assert pts.shape == (1, 40, 2)
    assert np.all(np.abs(pts[0, :, 0] - 23.5) < 2.0)


@pytest.mark.slow
def test_track_monocular_smoke():
    import jax

    from banet_tpu.config import Config, ModelConfig, SolverConfig
    from banet_tpu.tracking import TwoViewTracker

    cfg = Config(model=ModelConfig(backbone="drn22",
                                   compute_dtype="float32"),
                 solver=SolverConfig(level_iters=(1, 1, 1, 1)))
    tracker = TwoViewTracker.initialize(cfg, image_size=(64, 96),
                                        num_points=16)
    rng = np.random.default_rng(1)
    img1 = (255.0 * rng.random((64, 96, 3))).astype(np.float32)
    img2 = (255.0 * rng.random((64, 96, 3))).astype(np.float32)
    R, t, depth = tracker.track_monocular(img1, img2, [80, 80, 48, 32],
                                          num_points=16)
    assert R.shape == (1, 3, 3)
    assert depth.shape == (1, 32, 48)
    assert np.all(np.isfinite(R)) and np.all(np.isfinite(depth))
    # Rotation stays orthonormal through the joint solve.
    err = np.abs(R[0] @ R[0].T - np.eye(3)).max()
    assert err < 1e-4
