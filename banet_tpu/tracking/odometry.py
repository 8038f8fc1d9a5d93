"""Sequence odometry: frame loop, keyframe policy, pose composition.

Equivalent of the reference sequence driver
(legacy/seq_example.py:150-208):

- track each frame against the current keyframe;
- compose relative poses into world frame:
    R_w = R_rel @ R_w_key ;  t_w = R_rel @ t_w_key + t_rel
  (legacy/seq_example.py:170-171 — note the reference composes
  camera-from-world transforms);
- keyframe policy: re-key when keep_ratio < 0.8 OR the time gap to the
  keyframe exceeds 0.1 s (legacy/seq_example.py:190), re-selecting
  textured points from the new keyframe's depth;
- warm start: next frame initialized from the last relative pose
  (legacy/seq_example.py:207-208); identity after re-keying.

Output is a camera-from-world Trajectory inverted to world-from-camera
(the TUM convention the reference prints at seq_example.py:176-180:
camera center = -R^T t, orientation R^T).
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, List, Optional, Tuple

import numpy as np

from banet_tpu.config import KeyframeConfig
from banet_tpu.data.points import select_points
from banet_tpu.eval.trajectory import Trajectory
from banet_tpu.tracking.tracker import TwoViewTracker


@dataclasses.dataclass
class OdometryStats:
    num_frames: int = 0
    num_keyframes: int = 0
    rejected_ratio_rekeys: int = 0
    time_gap_rekeys: int = 0


class OdometryRunner:
    def __init__(self, tracker: TwoViewTracker,
                 keyframe_cfg: Optional[KeyframeConfig] = None,
                 num_points: int = 1024,
                 texture_threshold: float = 120.0,
                 seed: int = 0):
        self.tracker = tracker
        self.kf = keyframe_cfg or KeyframeConfig()
        self.num_points = num_points
        self.texture_threshold = texture_threshold
        self.rng = np.random.default_rng(seed)

    def run(self, frames: Iterable[Tuple[float, np.ndarray, np.ndarray]],
            intrinsics: np.ndarray) -> Tuple[Trajectory, OdometryStats]:
        """frames: iterable of (timestamp, rgb (H,W,3), depth (H,W)).

        The first frame seeds the first keyframe.  Returns the
        world-from-camera trajectory and run statistics.
        """
        stats = OdometryStats()
        stamps: List[float] = []
        poses_cw: List[np.ndarray] = []  # camera-from-world (R, t) 4x4

        key_img = None
        key_pts = key_depths = None
        key_time = 0.0
        key_pose_cw = np.eye(4)
        initR = np.eye(3, dtype=np.float32)[None]
        initT = np.zeros((1, 3), np.float32)

        for ts, rgb, depth in frames:
            if key_img is None:
                key_img = rgb
                key_pts, key_depths = select_points(
                    rgb, depth, self.num_points, self.texture_threshold,
                    rng=self.rng)
                self.tracker.set_keyframe(rgb, intrinsics, key_pts,
                                          key_depths)
                key_time = ts
                stats.num_keyframes += 1
                stamps.append(ts)
                poses_cw.append(key_pose_cw.copy())
                stats.num_frames += 1
                continue

            # Steady-state path: keyframe features are cached; only the
            # new frame's pyramid is computed.
            R, t, keep = self.tracker.track_frame(rgb, initR, initT)
            rel = np.eye(4)
            rel[:3, :3] = R[0]
            rel[:3, 3] = t[0]
            pose_cw = rel @ key_pose_cw
            stamps.append(ts)
            poses_cw.append(pose_cw)
            stats.num_frames += 1

            rekey_ratio = float(keep[0]) < self.kf.min_keep_ratio
            rekey_time = (ts - key_time) > self.kf.max_time_gap
            if rekey_ratio or rekey_time:
                stats.num_keyframes += 1
                stats.rejected_ratio_rekeys += int(rekey_ratio)
                stats.time_gap_rekeys += int(rekey_time and not rekey_ratio)
                key_img = rgb
                key_pts, key_depths = select_points(
                    rgb, depth, self.num_points, self.texture_threshold,
                    rng=self.rng)
                self.tracker.set_keyframe(rgb, intrinsics, key_pts,
                                          key_depths)
                key_time = ts
                key_pose_cw = pose_cw
                initR = np.eye(3, dtype=np.float32)[None]
                initT = np.zeros((1, 3), np.float32)
            else:
                initR = R.astype(np.float32)
                initT = t.astype(np.float32)

        # camera-from-world -> world-from-camera for TUM output.
        poses_wc = [np.linalg.inv(T) for T in poses_cw]
        return Trajectory(np.asarray(stamps), np.asarray(poses_wc)), stats
