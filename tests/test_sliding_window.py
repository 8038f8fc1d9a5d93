"""Sliding-window odometry: window-BA refinement wired into the frame
loop (BASELINE config #3 shape)."""

import numpy as np
import pytest

from banet_tpu.config import Config, KeyframeConfig, ModelConfig, \
    SolverConfig
from banet_tpu.data.tum import write_fake_sequence
from banet_tpu.tracking import OdometryRunner, TwoViewTracker


@pytest.mark.slow
def test_window_ba_odometry_smoke(tmp_path):
    cfg = Config(
        model=ModelConfig(backbone="drn22", compute_dtype="float32"),
        solver=SolverConfig(level_iters=(1, 1, 1, 1)),
    )
    tracker = TwoViewTracker.initialize(cfg, image_size=(64, 96),
                                        num_points=32)
    seq = write_fake_sequence(str(tmp_path / "seq"), num_frames=6)
    # Force a re-key every ~2 frames via the time-gap policy so the
    # window refinement path runs mid-sequence AND at the end.
    runner = OdometryRunner(
        tracker, keyframe_cfg=KeyframeConfig(max_time_gap=0.06),
        num_points=32, texture_threshold=10.0, window_ba=True,
        window_max_frames=2, window_iters=1)
    frames = ((f.timestamp, f.load_rgb(), f.load_depth()) for f in seq)
    traj, stats = runner.run(frames, seq.intrinsics)
    assert len(traj) == 6
    assert stats.window_refinements >= 2
    assert np.all(np.isfinite(traj.poses))


@pytest.mark.slow
def test_multi_keyframe_window_odometry(tmp_path):
    from banet_tpu.data.synthetic import write_rendered_sequence

    cfg = Config(
        model=ModelConfig(backbone="drn22", compute_dtype="float32"),
        solver=SolverConfig(level_iters=(1, 1, 1, 1)),
    )
    tracker = TwoViewTracker.initialize(cfg, image_size=(64, 96),
                                        num_points=32)
    seq = write_rendered_sequence(str(tmp_path / "rseq"), num_frames=8,
                                  size=(64, 96), seed=5)
    runner = OdometryRunner(
        tracker, keyframe_cfg=KeyframeConfig(max_time_gap=0.06),
        num_points=32, texture_threshold=10.0, window_ba=True,
        window_max_frames=2, window_iters=1, window_ba_mode="multi")
    frames = ((f.timestamp, f.load_rgb(), f.load_depth()) for f in seq)
    traj, stats = runner.run(frames, seq.intrinsics)
    assert len(traj) == 8
    # At least one multi-keyframe refinement ran (the first retire has
    # no previous keyframe and falls back to single mode).
    assert stats.window_refinements >= 2
    assert np.all(np.isfinite(traj.poses))
