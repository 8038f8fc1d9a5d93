"""Absolute Trajectory Error with Horn alignment.

Port-equivalent of the TUM benchmark tool the reference vendors
(reference evaluation/rgbd_benchmark/evaluate_ate.py:50-145): rigidly
align the estimated positions to ground truth with Horn's closed-form
method (SVD form), then report the RMSE of the residual translational
distances.  Pure numpy.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from banet_tpu.eval.associate import associate
from banet_tpu.eval.trajectory import Trajectory


def horn_align(model: np.ndarray,
               data: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Find rigid (R, t) minimizing || R @ model + t - data ||.

    model, data: (3, F) point sets (the evaluate_ate.py:50 convention).
    Returns (R (3,3), t (3,1)).
    """
    model_mean = model.mean(axis=1, keepdims=True)
    data_mean = data.mean(axis=1, keepdims=True)
    model_c = model - model_mean
    data_c = data - data_mean
    W = model_c @ data_c.T
    U, _, Vt = np.linalg.svd(W)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = Vt.T @ S @ U.T
    t = data_mean - R @ model_mean
    return R, t


def ate_rmse(gt_positions: np.ndarray, est_positions: np.ndarray) -> float:
    """RMSE of Horn-aligned translational error.  Inputs (F, 3)."""
    R, t = horn_align(est_positions.T, gt_positions.T)
    aligned = (R @ est_positions.T + t).T
    err = np.linalg.norm(aligned - gt_positions, axis=1)
    return float(np.sqrt(np.mean(err ** 2)))


def evaluate_ate(gt: Trajectory, est: Trajectory,
                 max_difference: float = 0.02) -> Dict[str, float]:
    """Associate by timestamp, align, and report ATE statistics
    (the evaluate_ate.py:116-145 output set)."""
    matches = associate(list(gt.timestamps), list(est.timestamps),
                        max_difference=max_difference)
    if len(matches) < 2:
        raise ValueError(
            f"only {len(matches)} matched poses; cannot evaluate ATE")
    gt_xyz = gt.positions[[m[0] for m in matches]]
    est_xyz = est.positions[[m[1] for m in matches]]
    R, t = horn_align(est_xyz.T, gt_xyz.T)
    aligned = (R @ est_xyz.T + t).T
    err = np.linalg.norm(aligned - gt_xyz, axis=1)
    return {
        "compared_pose_pairs": float(len(matches)),
        "ate_rmse": float(np.sqrt(np.mean(err ** 2))),
        "ate_mean": float(np.mean(err)),
        "ate_median": float(np.median(err)),
        "ate_std": float(np.std(err)),
        "ate_min": float(np.min(err)),
        "ate_max": float(np.max(err)),
    }
