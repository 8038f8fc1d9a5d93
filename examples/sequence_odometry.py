"""Sequence odometry example (the legacy/seq_example.py workflow).

Usage:
    python examples/sequence_odometry.py <tum_or_scannet_dir> \
        [--format scannet] [--window-ba]

Prints a TUM-format trajectory to stdout (like the reference,
seq_example.py:180) and ATE vs ground truth when available.
Equivalent one-liner: python -m banet_tpu.cli odometry <dir> ...
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import numpy as np

    from banet_tpu.config import default_config
    from banet_tpu.eval.ate import evaluate_ate
    from banet_tpu.eval.trajectory import _rot_to_quat
    from banet_tpu.tracking import OdometryRunner, TwoViewTracker

    args = sys.argv[1:]
    if not args:
        print(__doc__)
        return 1
    seq_dir = args[0]
    fmt = "scannet" if "--format" in args and "scannet" in args else "tum"
    if fmt == "scannet":
        from banet_tpu.data.scannet import ScanNetScene

        seq = ScanNetScene(seq_dir)
    else:
        from banet_tpu.data.tum import TumSequence

        seq = TumSequence(seq_dir)

    rgb0 = seq[0].load_rgb()
    tracker = TwoViewTracker.initialize(default_config(),
                                        image_size=rgb0.shape[:2],
                                        num_points=1024)
    runner = OdometryRunner(tracker, num_points=1024,
                            window_ba="--window-ba" in args)
    frames = ((f.timestamp, f.load_rgb(), f.load_depth()) for f in seq)
    traj, stats = runner.run(frames, seq.intrinsics)

    for ts, T in zip(traj.timestamps, traj.poses):
        q = _rot_to_quat(T[:3, :3])
        t = T[:3, 3]
        print(f"{ts:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
              f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}")

    gt = seq.groundtruth_trajectory()
    if len(gt) > 2:
        res = evaluate_ate(gt, traj)
        print(f"# ATE RMSE: {res['ate_rmse']:.4f} m over "
              f"{int(res['compared_pose_pairs'])} poses",
              file=sys.stderr)
    print(f"# frames={stats.num_frames} keyframes={stats.num_keyframes}",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
