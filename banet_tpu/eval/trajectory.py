"""Trajectory containers and TUM-format I/O.

The reference's output interface for sequences is TUM-format lines
"timestamp tx ty tz qx qy qz qw" printed to stdout (reference
legacy/seq_example.py:180) and consumed by the vendored benchmark
scripts; the DeepTAM harness has a writer with the same format
(reference rgbd_sequence.py:372-397).  Pure numpy — this runs on the
host, not the TPU.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, List

import numpy as np


def _quat_to_rot(q: np.ndarray) -> np.ndarray:
    """(x, y, z, w) quaternion -> 3x3 rotation (TUM component order)."""
    x, y, z, w = q
    n = np.sqrt(x * x + y * y + z * z + w * w)
    x, y, z, w = x / n, y / n, z / n, w / n
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _rot_to_quat(R: np.ndarray) -> np.ndarray:
    """3x3 rotation -> (x, y, z, w), w >= 0 (robust branch form)."""
    tr = np.trace(R)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    else:
        i = int(np.argmax(np.diag(R)))
        if i == 0:
            s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
            x, w = 0.25 * s, (R[2, 1] - R[1, 2]) / s
            y, z = (R[0, 1] + R[1, 0]) / s, (R[0, 2] + R[2, 0]) / s
        elif i == 1:
            s = np.sqrt(1.0 - R[0, 0] + R[1, 1] - R[2, 2]) * 2
            y, w = 0.25 * s, (R[0, 2] - R[2, 0]) / s
            x, z = (R[0, 1] + R[1, 0]) / s, (R[1, 2] + R[2, 1]) / s
        else:
            s = np.sqrt(1.0 - R[0, 0] - R[1, 1] + R[2, 2]) * 2
            z, w = 0.25 * s, (R[1, 0] - R[0, 1]) / s
            x, y = (R[0, 2] + R[2, 0]) / s, (R[1, 2] + R[2, 1]) / s
    q = np.array([x, y, z, w])
    if w < 0:
        q = -q
    return q / np.linalg.norm(q)


def pose_matrix(t: np.ndarray, q_xyzw: np.ndarray) -> np.ndarray:
    """4x4 homogeneous pose from translation + TUM quaternion."""
    T = np.eye(4)
    T[:3, :3] = _quat_to_rot(np.asarray(q_xyzw, np.float64))
    T[:3, 3] = t
    return T


@dataclasses.dataclass
class Trajectory:
    """Timestamped world-from-camera poses."""

    timestamps: np.ndarray  # (F,)
    poses: np.ndarray       # (F, 4, 4) homogeneous

    def __len__(self):
        return len(self.timestamps)

    @property
    def positions(self) -> np.ndarray:
        return self.poses[:, :3, 3]

    @classmethod
    def from_rt(cls, timestamps: Iterable[float], Rs: np.ndarray,
                ts: np.ndarray) -> "Trajectory":
        stamps = np.asarray(list(timestamps), np.float64)
        F = len(stamps)
        poses = np.tile(np.eye(4), (F, 1, 1))
        poses[:, :3, :3] = Rs
        poses[:, :3, 3] = ts
        return cls(stamps, poses)


def load_tum_trajectory(path: str) -> Trajectory:
    """Read TUM format: "timestamp tx ty tz qx qy qz qw"; '#' comments
    and empty lines skipped (benchmark file conventions)."""
    stamps: List[float] = []
    poses: List[np.ndarray] = []
    with open(path) as f:
        for lineno, line in enumerate(f, 1):
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            try:
                vals = [float(v) for v in line.replace(",", " ").split()]
            except ValueError as e:
                raise ValueError(
                    f"{path}:{lineno}: unparseable trajectory line "
                    f"({line[:40]!r}); expected 'timestamp tx ty tz "
                    f"qx qy qz qw'") from e
            if len(vals) < 8:
                continue
            stamps.append(vals[0])
            poses.append(pose_matrix(np.array(vals[1:4]),
                                     np.array(vals[4:8])))
    return Trajectory(np.asarray(stamps), np.asarray(poses))


def save_tum_trajectory(path: str, traj: Trajectory) -> None:
    with open(path, "w") as f:
        for ts, T in zip(traj.timestamps, traj.poses):
            q = _rot_to_quat(T[:3, :3])
            t = T[:3, 3]
            f.write(f"{ts:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
                    f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n")
