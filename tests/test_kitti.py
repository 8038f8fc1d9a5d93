import os

import numpy as np
import pytest

from banet_tpu.data.kitti import (KittiOdometrySequence,
                                  write_fake_kitti_sequence)


def test_fake_sequence_roundtrip(tmp_path):
    seq = write_fake_kitti_sequence(str(tmp_path / "kitti"),
                                    num_frames=5)
    assert len(seq) == 5
    np.testing.assert_allclose(seq.intrinsics, [80, 80, 48, 32])
    f = seq[1]
    rgb = f.load_rgb()
    depth = f.load_depth()
    assert rgb.shape == (64, 96, 3)
    assert depth.shape == (64, 96)
    # meters*256 uint16 encoding round-trips to metric meters.
    assert 1.9 < depth.min() and depth.max() < 20.1
    assert f.gt_pose is not None and f.gt_pose[0, 3] == 0.05
    gt = seq.groundtruth_trajectory()
    assert len(gt) == 5
    np.testing.assert_allclose(np.diff(gt.positions[:, 0]), 0.05,
                               atol=1e-7)
    # times.txt stamps at 10 Hz.
    np.testing.assert_allclose(np.diff(gt.timestamps), 0.1, atol=1e-9)


def test_no_depth_and_no_poses(tmp_path):
    seq = write_fake_kitti_sequence(str(tmp_path / "kitti"),
                                    num_frames=3, with_depth=False,
                                    with_poses=False)
    assert len(seq) == 3
    assert seq[0].gt_pose is None
    with pytest.raises(FileNotFoundError):
        seq[0].load_depth()


def test_stride_and_calib_fallback(tmp_path):
    root = str(tmp_path / "kitti")
    write_fake_kitti_sequence(root, num_frames=6)
    seq_dir = os.path.join(root, "sequences", "00")
    # Drop P2/P3 lines: parser must fall back to P0.
    with open(os.path.join(seq_dir, "calib.txt")) as f:
        lines = [l for l in f if not l.startswith(("P2", "P3"))]
    with open(os.path.join(seq_dir, "calib.txt"), "w") as f:
        f.writelines(lines)
    seq = KittiOdometrySequence(seq_dir, stride=2)
    assert [f.index for f in seq.frames] == [0, 2, 4]
    np.testing.assert_allclose(seq.intrinsics, [80, 80, 48, 32])


def test_cli_odometry_kitti(tmp_path, capsys):
    """End-to-end: KITTI-layout sequence through the odometry CLI
    (the BASELINE config #5 workload shape, single chip)."""
    from banet_tpu.cli import main

    root = str(tmp_path / "kitti")
    write_fake_kitti_sequence(root, num_frames=3)
    out = str(tmp_path / "traj.txt")
    rc = main(["odometry", os.path.join(root, "sequences", "00"),
               "--format", "kitti", "--out", out,
               "--num-points", "64", "--iters", "1", "1", "1", "1",
               "--max-time-gap", "0.5"])
    assert rc == 0
    import json

    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["frames"] == 3
    traj = np.loadtxt(out)
    assert traj.shape == (3, 8)
