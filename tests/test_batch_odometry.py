"""Batched lockstep odometry (tracking/batch_odometry.py): per-element
equivalence with the serial runner, and the multi-sequence CLI mode."""

import numpy as np
import pytest

from banet_tpu.config import default_config
from banet_tpu.tracking import OdometryRunner, TwoViewTracker
from banet_tpu.tracking.batch_odometry import BatchedOdometryRunner


@pytest.mark.slow
def test_batched_matches_serial(tmp_path):
    from banet_tpu.data.synthetic import write_rendered_sequence

    H, W, N, F = 64, 96, 32, 5
    seqs = [write_rendered_sequence(str(tmp_path / f"s{i}"),
                                    num_frames=F, size=(H, W), seed=10 + i)
            for i in range(2)]
    frame_lists = [[(f.timestamp, f.load_rgb(), f.load_depth())
                    for f in s.frames] for s in seqs]

    tracker = TwoViewTracker.initialize(default_config(),
                                        image_size=(H, W), num_points=N)

    # Per-element INDEPENDENCE: a batch holding the same sequence twice
    # must produce bitwise-identical trajectories for both elements
    # (same executable, same reduction order — any difference means
    # cross-element leakage).
    dup = BatchedOdometryRunner(tracker, num_points=N, seed=7)
    trajs_d, _ = dup.run([frame_lists[0], frame_lists[0]],
                         [seqs[0].intrinsics] * 2)
    np.testing.assert_array_equal(np.asarray(trajs_d[0].poses),
                                  np.asarray(trajs_d[1].poses))

    batched = BatchedOdometryRunner(tracker, num_points=N, seed=7)
    trajs_b, stats = batched.run(frame_lists,
                                 [s.intrinsics for s in seqs])
    assert stats.num_frames == 2 * F
    assert len(trajs_b) == 2

    for i, s in enumerate(seqs):
        serial = OdometryRunner(
            TwoViewTracker.initialize(default_config(),
                                      image_size=(H, W), num_points=N),
            num_points=N, seed=7)
        traj_s, _ = serial.run(iter(frame_lists[i]), s.intrinsics)
        # Same model init seed, same point-selection rng seed => the
        # same problem.  B=2 vs B=1 executables reduce in different
        # orders, and with UNTRAINED random features the GN cascade
        # amplifies that f32 noise to ~mm scale (same effect as in
        # test_fast_sym_conv's e2e note) — so assert agreement at that
        # scale, plus identical structure.
        assert len(traj_s.poses) == len(trajs_b[i].poses)
        np.testing.assert_array_equal(trajs_b[i].timestamps,
                                      traj_s.timestamps)
        dt = np.abs(np.asarray(trajs_b[i].poses)[:, :3, 3]
                    - np.asarray(traj_s.poses)[:, :3, 3])
        # B=2 vs B=1 executables reduce in different orders; with
        # UNTRAINED random features the GN accept/reject threshold can
        # flip under that noise and the warm-started drift accumulates
        # — only a loose trajectory-scale bound is meaningful here (the
        # strict invariant is the duplicate-element check above).
        assert dt.max() < 5e-2, dt.max()


@pytest.mark.slow
def test_cli_multi_sequence(tmp_path):
    import json
    import os
    import subprocess
    import sys

    from banet_tpu.data.synthetic import write_rendered_sequence

    dirs = []
    for i in range(2):
        d = str(tmp_path / f"seq{i}")
        write_rendered_sequence(d, num_frames=3, size=(64, 96),
                                seed=20 + i)
        dirs.append(d)
    out = str(tmp_path / "traj.txt")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    proc = subprocess.run(
        [sys.executable, "-m", "banet_tpu.cli", "odometry"] + dirs +
        ["--out", out, "--num-points", "16", "--max-frames", "3"],
        capture_output=True, text=True, env=env, timeout=1800)
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rec["sequences"] == 2 and rec["frames"] == 6
    for i in range(2):
        assert len(open(f"{out}.{i}.txt").read().strip()
                   .splitlines()) == 3


@pytest.mark.slow
def test_batched_window_ba_matches_serial(tmp_path):
    """Single-mode window BA in the batched runner is the serial
    runner's refine_window applied per element at rekey — same padded
    jit, same warm-start convention — so per-element trajectories must
    agree at the same f32-reduction-noise scale as the plain runners,
    and refinements must actually fire (forced by a tiny time gap)."""
    import dataclasses

    from banet_tpu.config import KeyframeConfig
    from banet_tpu.data.synthetic import write_rendered_sequence

    H, W, N, F = 64, 96, 32, 6
    seqs = [write_rendered_sequence(str(tmp_path / f"s{i}"),
                                    num_frames=F, size=(H, W),
                                    seed=30 + i)
            for i in range(2)]
    frame_lists = [[(f.timestamp, f.load_rgb(), f.load_depth())
                    for f in s.frames] for s in seqs]
    # Force a rekey mid-sequence so the retiring-window refinement
    # path runs (not only the final close-out).
    kf = dataclasses.replace(KeyframeConfig(), max_time_gap=0.08)

    tracker = TwoViewTracker.initialize(default_config(),
                                        image_size=(H, W), num_points=N)
    batched = BatchedOdometryRunner(tracker, keyframe_cfg=kf,
                                    num_points=N, seed=7,
                                    window_ba=True, window_max_frames=3)
    trajs_b, stats = batched.run(frame_lists,
                                 [s.intrinsics for s in seqs])
    assert stats.window_refinements >= 2 * 2  # >=1 rekey + closeout each

    for i, s in enumerate(seqs):
        serial = OdometryRunner(
            TwoViewTracker.initialize(default_config(),
                                      image_size=(H, W), num_points=N),
            keyframe_cfg=kf, num_points=N, seed=7,
            window_ba=True, window_max_frames=3)
        traj_s, st_s = serial.run(iter(frame_lists[i]), s.intrinsics)
        assert st_s.window_refinements >= 2
        np.testing.assert_array_equal(trajs_b[i].timestamps,
                                      traj_s.timestamps)
        dt = np.abs(np.asarray(trajs_b[i].poses)[:, :3, 3]
                    - np.asarray(traj_s.poses)[:, :3, 3])
        assert dt.max() < 5e-2, dt.max()
