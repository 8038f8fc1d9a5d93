"""The legacy-tracker operating point (drn54 backbone, 3-level pyramid,
z=1 rays, renormalized residuals — config.legacy_tracker_config) runs
end-to-end."""

import numpy as np
import pytest


@pytest.mark.slow
def test_legacy_tracker_e2e():
    import dataclasses

    from banet_tpu.config import legacy_tracker_config, SolverConfig
    from banet_tpu.tracking import TwoViewTracker

    base = legacy_tracker_config()
    cfg = dataclasses.replace(
        base,
        model=dataclasses.replace(base.model, compute_dtype="float32"),
        solver=dataclasses.replace(base.solver, level_iters=(1, 1, 1)))
    tracker = TwoViewTracker.initialize(cfg, image_size=(64, 96),
                                        num_points=16)
    rng = np.random.default_rng(0)
    img1 = (255.0 * rng.random((64, 96, 3))).astype(np.float32)
    img2 = (255.0 * rng.random((64, 96, 3))).astype(np.float32)
    pts = (rng.random((16, 2)) * np.array([80.0, 48.0]) + 8).astype(
        np.float32)
    d = np.full((16,), 2.0, np.float32)
    R, t, keep = tracker.track(img1, img2, [80, 80, 48, 32], pts, d)
    assert R.shape == (1, 3, 3)
    assert np.all(np.isfinite(R)) and np.all(np.isfinite(t))
    err = np.abs(R[0] @ R[0].T - np.eye(3)).max()
    assert err < 1e-4
