"""Relative Pose Error (drift per time interval).

Port-equivalent of the TUM benchmark tool the reference vendors
(reference evaluation/rgbd_benchmark/evaluate_rpe.py:204-308, driven at
example_advanced_sequence.py:143-146): for frame pairs (i, j) separated
by a fixed delta, compare the relative motions

  E = (Q_i^{-1} Q_j)^{-1} (P_i^{-1} P_j)

with Q ground truth and P estimated; report ||trans(E)|| and the
rotation angle of E.  With ``delta_unit='s'`` errors are per-second
drift rates (the RPE numbers the paper reports).  Pure numpy.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from banet_tpu.eval.trajectory import Trajectory


def _rotation_angle(R: np.ndarray) -> float:
    return float(np.arccos(np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)))


def evaluate_rpe(gt: Trajectory, est: Trajectory, delta: float = 1.0,
                 delta_unit: str = "s",
                 max_pairs: int = 10000) -> Dict[str, float]:
    """RPE over fixed-delta pairs.

    delta_unit: 's' (seconds, evaluated against timestamps — divides by
    the actual interval so values are drift/s) or 'f' (frames).
    Trajectories must already share timestamps index-aligned (use
    eval.associate upstream); this mirrors how the reference harness
    feeds it (metrics.py:25-91 writes temp files with matched stamps).
    """
    assert len(gt) == len(est), "trajectories must be index-aligned"
    F = len(gt)
    pairs = []
    if delta_unit == "f":
        step = max(int(delta), 1)
        pairs = [(i, i + step) for i in range(F - step)]
    elif delta_unit == "s":
        stamps = gt.timestamps
        j = 0
        for i in range(F):
            target = stamps[i] + delta
            while j < F and stamps[j] < target:
                j += 1
            if j < F:
                pairs.append((i, j))
            j = max(j - 1, 0)
    else:
        raise ValueError(f"unknown delta_unit {delta_unit!r}")
    if len(pairs) > max_pairs:
        idx = np.linspace(0, len(pairs) - 1, max_pairs).astype(int)
        pairs = [pairs[k] for k in idx]
    if not pairs:
        raise ValueError("no frame pairs for the requested delta")

    trans_err, rot_err = [], []
    for i, j in pairs:
        Qi, Qj = gt.poses[i], gt.poses[j]
        Pi, Pj = est.poses[i], est.poses[j]
        E = np.linalg.inv(np.linalg.inv(Qi) @ Qj) @ (
            np.linalg.inv(Pi) @ Pj)
        te = np.linalg.norm(E[:3, 3])
        re = _rotation_angle(E[:3, :3])
        if delta_unit == "s":
            dt = gt.timestamps[j] - gt.timestamps[i]
            if dt <= 0:
                continue
            te, re = te / dt, re / dt
        trans_err.append(te)
        rot_err.append(re)

    trans_err = np.asarray(trans_err)
    rot_err = np.asarray(rot_err)
    return {
        "compared_pose_pairs": float(len(trans_err)),
        "rpe_trans_rmse": float(np.sqrt(np.mean(trans_err ** 2))),
        "rpe_trans_mean": float(np.mean(trans_err)),
        "rpe_trans_median": float(np.median(trans_err)),
        "rpe_rot_rmse_deg": float(np.rad2deg(np.sqrt(np.mean(rot_err ** 2)))),
        "rpe_rot_mean_deg": float(np.rad2deg(np.mean(rot_err))),
        "rpe_rot_median_deg": float(np.rad2deg(np.median(rot_err))),
    }
