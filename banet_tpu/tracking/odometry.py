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
    window_refinements: int = 0
    tnet_rescues: int = 0


class OdometryRunner:
    """Frame loop with keyframe policy; optionally refines each closed
    keyframe window with the joint window BA (sliding-window mode —
    BASELINE config #3's shape).

    ``window_ba=True`` requires the tracker's model to provide
    ``window_bundle_adjust`` (the flagship BANet does): when a keyframe
    retires, the frames tracked against it are jointly re-solved with
    the network's depth basis and the refined relative poses replace
    the two-view estimates in the trajectory.

    ``window_ba_mode="multi"`` additionally couples the PREVIOUS
    keyframe into the solve (ba/multi_window_ba.py): the retiring
    keyframe's pose becomes a variable anchored to the previous
    keyframe (the gauge), its window frames observe both keyframes'
    point sets, and the refined keyframe-chain link replaces the
    two-view estimate — pose-graph consistency across adjacent
    keyframe windows.
    """

    def __init__(self, tracker: TwoViewTracker,
                 keyframe_cfg: Optional[KeyframeConfig] = None,
                 num_points: int = 1024,
                 texture_threshold: float = 120.0,
                 seed: int = 0,
                 window_ba: bool = False,
                 window_max_frames: int = 4,
                 window_iters: int = 3,
                 window_ba_mode: str = "single",
                 tnet=None, tnet_variables=None,
                 tnet_size: Tuple[int, int] = (64, 96),
                 tnet_mode: str = "rescue",
                 tnet_rescue_keep: float = 0.85):
        """``tnet``/``tnet_variables``: optional TrackingNet regressor
        (models/tracking_net.py) for hybrid odometry: the net renders
        the keyframe at the warm-start pose and predicts the
        correction, converting fast-motion local-minimum failures of
        the feature-metric solver into convergent tracks.  Inputs are
        resized to ``tnet_size`` (the net's MotionBlock flattens its
        spatial grid, so weights are resolution-specific); the pose is
        resolution-independent.

        ``tnet_mode``:
        - ``"rescue"`` (default): track from the warm start first; only
          when the solve looks broken (keep_ratio < ``tnet_rescue_keep``)
          re-track from the regressor's init, adopting it iff the
          finest-level feature residual improves.  The regressor's
          ~0.5 deg prediction noise therefore never touches healthy
          frames (measured: unconditional init turns a 0.09 m-ATE
          sequence into meters of drift, while GN-only gets 0% success
          beyond ~3 deg offsets — rescue composes both regimes).
        - ``"always"``: regressor init on every frame, adopted under
          the same residual test.
        """
        self.tracker = tracker
        self.kf = keyframe_cfg or KeyframeConfig()
        self.num_points = num_points
        self.texture_threshold = texture_threshold
        self.rng = np.random.default_rng(seed)
        self.window_ba = window_ba
        self.window_max_frames = window_max_frames
        self.window_iters = window_iters
        self.window_ba_mode = window_ba_mode
        self.tnet = tnet
        self.tnet_variables = tnet_variables
        self.tnet_size = tnet_size
        self.tnet_mode = tnet_mode
        self.tnet_rescue_keep = tnet_rescue_keep
        if tnet is not None:
            import jax
            import jax.numpy as jnp

            from banet_tpu.geometry.camera import Intrinsics

            th, tw = tnet_size

            def _tnet_init(variables, key_img, key_depth, cur_img, k,
                           R0, t0):
                H, W = key_img.shape[1:3]
                sx, sy = tw / W, th / H
                ki = jax.image.resize(key_img, (1, th, tw, 3),
                                      "bilinear")
                ci = jax.image.resize(cur_img, (1, th, tw, 3),
                                      "bilinear")
                kd = jax.image.resize(key_depth, (1, th, tw), "bilinear")
                intr = Intrinsics(k[:, 0] * sx, k[:, 1] * sy,
                                  k[:, 2] * sx, k[:, 3] * sy)
                out = self.tnet.apply(variables, ki, kd, ci, intr,
                                      R0=R0, t0=t0)
                return out.R, out.t

            self._tnet_init = jax.jit(_tnet_init)
        if window_ba:
            import jax

            model = tracker.model

            def _refine(variables, img_key, imgs_tgt, k, pts, fmask,
                        Rs0, ts0):
                from banet_tpu.geometry.camera import Intrinsics

                intr = Intrinsics.from_array(k)
                out = model.apply(variables, img_key, imgs_tgt, intr,
                                  pts, num_iters=self.window_iters,
                                  frame_mask=fmask, Rs0=Rs0, ts0=ts0,
                                  method=model.window_bundle_adjust)
                return out["Rs"], out["ts"]

            self._refine = jax.jit(_refine)

            def _refine_multi(variables, imgs_key, imgs_tgt, k, pts,
                              obs_mask, Rk0, tk0, Rf0, tf0):
                from banet_tpu.geometry.camera import Intrinsics

                intr = Intrinsics.from_array(k)
                out = model.apply(
                    variables, imgs_key, imgs_tgt, intr, pts,
                    obs_mask=obs_mask, Rs_k0=Rk0, ts_k0=tk0,
                    Rs_f0=Rf0, ts_f0=tf0,
                    num_iters=self.window_iters,
                    method=model.multi_window_bundle_adjust)
                return out["Rs_f"], out["ts_f"], out["Rs_k"], out["ts_k"]

            self._refine_multi = jax.jit(_refine_multi)

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
        key_depth_map = None
        intr_arr = np.asarray(intrinsics, np.float32).reshape(-1, 4)
        key_time = 0.0
        key_pose_cw = np.eye(4)
        key_traj_idx = 0
        # Previous keyframe (multi-keyframe window mode couples it in).
        prev_kf = None  # dict(img, pts, pose_cw, traj_idx)
        initR = np.eye(3, dtype=np.float32)[None]
        initT = np.zeros((1, 3), np.float32)
        # (trajectory index, image) of frames tracked vs the keyframe.
        window_buf = []

        def refine_window():
            """Joint window-BA re-solve of the retiring keyframe's
            frames; returns the refined camera-from-world pose of the
            last frame (the next keyframe's anchor)."""
            if not (self.window_ba and window_buf):
                return None
            frames_w = window_buf[-self.window_max_frames:]
            imgs = np.stack([img for _, img in frames_w])
            # Pad to a fixed window length (repeat the last frame) so
            # the jitted window solve compiles once, not per length;
            # the frame mask zeroes the padded frames' contribution to
            # the joint system (they would otherwise double-count).
            n_valid = len(frames_w)
            fmask = np.zeros((self.window_max_frames,), np.float32)
            fmask[:n_valid] = 1.0
            if n_valid < self.window_max_frames:
                pad = np.repeat(imgs[-1:],
                                self.window_max_frames - n_valid, axis=0)
                imgs = np.concatenate([imgs, pad], axis=0)
            k = np.asarray(intrinsics, np.float32).reshape(1, 4)
            if self.window_ba_mode == "multi" and prev_kf is not None:
                # Window origin = previous keyframe; the retiring
                # keyframe's pose is variable (chain-link refinement).
                origin = prev_kf["pose_cw"]
                origin_inv = np.linalg.inv(origin)
                imgs_key = np.stack([prev_kf["img"].astype(np.float32),
                                     key_img.astype(np.float32)])
                pts2 = np.concatenate([prev_kf["pts"], key_pts], axis=0)
                T_key = (key_pose_cw @ origin_inv).astype(np.float32)
                Rk0 = np.stack([np.eye(3, dtype=np.float32),
                                T_key[:3, :3]])
                tk0 = np.stack([np.zeros(3, np.float32), T_key[:3, 3]])
                Rf0, tf0 = [], []
                for ti, _img in frames_w:
                    Tf = (poses_cw[ti] @ origin_inv).astype(np.float32)
                    Rf0.append(Tf[:3, :3])
                    tf0.append(Tf[:3, 3])
                while len(Rf0) < self.window_max_frames:
                    Rf0.append(Rf0[-1])
                    tf0.append(tf0[-1])
                obs = np.ones((2, self.window_max_frames),
                              np.float32) * fmask[None, :]
                Rs_f, ts_f, Rs_k, ts_k = self._refine_multi(
                    self.tracker.variables, imgs_key, imgs, k, pts2,
                    obs, Rk0, tk0, np.stack(Rf0), np.stack(tf0))
                Rs, ts = np.asarray(Rs_f), np.asarray(ts_f)
                stats.window_refinements += 1
                last_pose = None
                for fi, (ti, _img) in enumerate(frames_w):
                    rel = np.eye(4)
                    rel[:3, :3] = Rs[fi]
                    rel[:3, 3] = ts[fi]
                    refined = rel @ origin
                    poses_cw[ti] = refined
                    last_pose = refined
                # Refined keyframe-chain link updates the retiring
                # keyframe's own trajectory entry.
                Rk = np.asarray(Rs_k)
                tk = np.asarray(ts_k)
                link = np.eye(4)
                link[:3, :3] = Rk[1]
                link[:3, 3] = tk[1]
                poses_cw[key_traj_idx] = link @ origin
                return last_pose
            # Warm-start the joint solve from the TRACKED per-frame
            # poses (relative to the keyframe) — from-identity window
            # BA undoes good tracking (banet.window_bundle_adjust
            # docstring; measured 4x easy-seq ATE regression).
            key_inv = np.linalg.inv(key_pose_cw)
            Rf0, tf0 = [], []
            for ti, _img in frames_w:
                Tf = (poses_cw[ti] @ key_inv).astype(np.float32)
                Rf0.append(Tf[:3, :3])
                tf0.append(Tf[:3, 3])
            while len(Rf0) < self.window_max_frames:
                Rf0.append(Rf0[-1])
                tf0.append(tf0[-1])
            Rs, ts = self._refine(self.tracker.variables,
                                  key_img.astype(np.float32), imgs, k,
                                  key_pts, fmask,
                                  np.stack(Rf0), np.stack(tf0))
            Rs = np.asarray(Rs)
            ts = np.asarray(ts)
            stats.window_refinements += 1
            last_pose = None
            for fi, (ti, _img) in enumerate(frames_w):
                rel = np.eye(4)
                rel[:3, :3] = Rs[fi]
                rel[:3, 3] = ts[fi]
                refined = rel @ key_pose_cw
                poses_cw[ti] = refined
                last_pose = refined
            return last_pose

        for ts, rgb, depth in frames:
            if key_img is None:
                key_img = rgb
                key_pts, key_depths = select_points(
                    rgb, depth, self.num_points, self.texture_threshold,
                    rng=self.rng)
                self.tracker.set_keyframe(rgb, intrinsics, key_pts,
                                          key_depths)
                key_depth_map = depth
                key_time = ts
                stats.num_keyframes += 1
                stamps.append(ts)
                poses_cw.append(key_pose_cw.copy())
                stats.num_frames += 1
                continue

            # Steady-state path: keyframe features are cached; only the
            # new frame's pyramid is computed.
            R, t, keep, res = self.tracker.track_frame(
                rgb, initR, initT, with_residual=True)
            if self.tnet is not None and (
                    self.tnet_mode == "always"
                    or float(keep[0]) < self.tnet_rescue_keep):
                Ri, ti = self._tnet_init(
                    self.tnet_variables,
                    np.asarray(key_img, np.float32)[None],
                    np.asarray(key_depth_map, np.float32)[None],
                    np.asarray(rgb, np.float32)[None],
                    intr_arr, initR, initT)
                R2, t2, keep2, res2 = self.tracker.track_frame(
                    rgb, np.asarray(Ri, np.float32),
                    np.asarray(ti, np.float32), with_residual=True)
                # Adopt the regressor-seeded solve only when it lands
                # in a better feature-metric optimum.
                if (float(res2[0]) < float(res[0])
                        and float(keep2[0]) >= float(keep[0]) - 0.02):
                    R, t, keep = R2, t2, keep2
                    stats.tnet_rescues += 1
            R, t, keep = np.asarray(R), np.asarray(t), np.asarray(keep)
            rel = np.eye(4)
            rel[:3, :3] = R[0]
            rel[:3, 3] = t[0]
            pose_cw = rel @ key_pose_cw
            stamps.append(ts)
            poses_cw.append(pose_cw)
            window_buf.append((len(poses_cw) - 1, rgb))
            stats.num_frames += 1

            rekey_ratio = float(keep[0]) < self.kf.min_keep_ratio
            rekey_time = (ts - key_time) > self.kf.max_time_gap
            if rekey_ratio or rekey_time:
                refined_last = refine_window()
                if refined_last is not None:
                    pose_cw = refined_last
                window_buf = []
                stats.num_keyframes += 1
                stats.rejected_ratio_rekeys += int(rekey_ratio)
                stats.time_gap_rekeys += int(rekey_time and not rekey_ratio)
                prev_kf = dict(img=key_img, pts=key_pts,
                               pose_cw=poses_cw[key_traj_idx].copy(),
                               traj_idx=key_traj_idx)
                key_traj_idx = len(poses_cw) - 1
                key_img = rgb
                key_pts, key_depths = select_points(
                    rgb, depth, self.num_points, self.texture_threshold,
                    rng=self.rng)
                # This frame was just tracked, so its pyramid is on
                # device — re-keys are encoder-free (tracker docstring).
                self.tracker.set_keyframe(rgb, intrinsics, key_pts,
                                          key_depths,
                                          reuse_last_target=True)
                key_depth_map = depth
                key_time = ts
                key_pose_cw = pose_cw
                initR = np.eye(3, dtype=np.float32)[None]
                initT = np.zeros((1, 3), np.float32)
            else:
                initR = R.astype(np.float32)
                initT = t.astype(np.float32)

        refine_window()  # close out the final open window
        # camera-from-world -> world-from-camera for TUM output.
        poses_wc = [np.linalg.inv(T) for T in poses_cw]
        return Trajectory(np.asarray(stamps), np.asarray(poses_wc)), stats
