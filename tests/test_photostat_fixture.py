"""Committed photographic-statistics fixture (tests/data/photostat_seq,
domain "P" dead-leaves textures — data/synthetic._dead_leaves_texture).

VERDICT r4 missing #1: every accuracy number came from the smooth
analytic-texture renderer, which may flatter feature nets.  This
fixture pins a rendered sequence with NATURAL-image statistics
(scale-invariant dead-leaves spectrum: flat regions, sharp occlusion
edges, heavy-tailed gradients) into the repo so (a) the loader/tracker
path over photo-like imagery is regression-tested on every run and
(b) the campaign eval can score against it byte-identically across
rounds (role of TUM fr1 for the reference, legacy/eval.py:151)."""

import os

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(__file__), "data", "photostat_seq")


def test_fixture_loads_and_has_photographic_statistics():
    from banet_tpu.data.tum import TumSequence

    seq = TumSequence(FIX)
    assert len(seq) == 8
    rgb = seq[0].load_rgb()
    assert rgb.shape == (96, 128, 3)
    gx = np.abs(np.diff(rgb[..., 0].astype(np.float32), axis=1))
    # Heavy-tailed gradient distribution = sparse sharp edges over
    # flat regions (the analytic-texture domains measure ~10-15 here;
    # natural images and dead-leaves >> that).
    kurt = float(((gx - gx.mean()) ** 4).mean() / gx.var() ** 2)
    assert kurt > 30.0, kurt
    # Depth + GT present and consistent.
    d = seq[0].load_depth()
    assert d.shape == (96, 128) and (d > 0).mean() > 0.9
    assert os.path.exists(os.path.join(FIX, "groundtruth.txt"))


@pytest.mark.slow
def test_odometry_runs_on_photostat_fixture():
    """Sequence odometry over the dead-leaves imagery must run end to
    end with finite poses (feature pipeline + point selection + solver
    don't depend on smooth textures).  Accuracy against GT is scored
    with trained weights by scripts/eval_trajectory_campaign.py
    --domain P."""
    from banet_tpu.config import Config, ModelConfig, SolverConfig
    from banet_tpu.data.tum import TumSequence
    from banet_tpu.tracking import OdometryRunner, TwoViewTracker

    seq = TumSequence(FIX)
    cfg = Config(
        model=ModelConfig(backbone="drn22", compute_dtype="float32"),
        solver=SolverConfig(level_iters=(1, 1, 1, 1)),
    )
    tracker = TwoViewTracker.initialize(cfg, image_size=(96, 128),
                                        num_points=64)
    runner = OdometryRunner(tracker, num_points=64)
    frames = ((f.timestamp, f.load_rgb(), f.load_depth())
              for f in seq.frames[:5])
    traj, stats = runner.run(frames, seq.intrinsics)
    assert len(traj) == 5
    assert np.all(np.isfinite(traj.poses))
    assert stats.num_keyframes >= 1
