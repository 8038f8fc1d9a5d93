"""Hybrid (regression-init + GN-refine) tracker smoke."""

import numpy as np
import pytest


@pytest.mark.slow
def test_hybrid_track_smoke():
    from banet_tpu.config import Config, ModelConfig, SolverConfig
    from banet_tpu.tracking import HybridTracker

    cfg = Config(model=ModelConfig(backbone="drn22",
                                   compute_dtype="float32"),
                 solver=SolverConfig(level_iters=(1, 1, 1, 1)))
    tr = HybridTracker.initialize(cfg, image_size=(64, 96),
                                  num_points=16, num_motion_samples=8)
    rng = np.random.default_rng(0)
    img1 = (255.0 * rng.random((64, 96, 3))).astype(np.float32)
    img2 = (255.0 * rng.random((64, 96, 3))).astype(np.float32)
    pts = (rng.random((16, 2)) * np.array([80.0, 48.0]) + 8).astype(
        np.float32)
    d = np.full((16,), 2.0, np.float32)
    R, t, keep, R0, t0, std = tr.track(img1, img2, [80, 80, 48, 32],
                                       pts, d)
    assert R.shape == (1, 3, 3) and R0.shape == (1, 3, 3)
    assert std.shape == (1, 6)
    assert np.all(np.isfinite(R)) and np.all(np.isfinite(t))
    err = np.abs(R[0] @ R[0].T - np.eye(3)).max()
    assert err < 1e-4
