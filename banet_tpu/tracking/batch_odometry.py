"""Batched odometry: track S sequences in lockstep on one chip.

The round-3 profile (artifacts/PROFILE_r03/README.md) proved the B=1
tracked frame is latency-bound — the GN chain's ~52 us/iteration is
per-launch/dependent-op latency, and the B=1 conv stack leaves the MXU
mostly idle; the SAME code at B=8 runs the marginal frame ~2x cheaper.
This module makes that measured fact a PRODUCT path rather than a
bench construct (VERDICT r3 item 2): a serving deployment tracking many
cameras/sequences steps them together, one batched ``track_frame`` per
tick.

Semantics per element match tracking/odometry.OdometryRunner's core
loop (keyframe policy thresholds, warm starts, pose composition —
reference legacy/seq_example.py:150-208): keyframe re-keys are decided
per element on the host and re-encode only that element's keyframe
(B=1 ``features`` call, amortized over the keyframe lifetime).

Window BA (single-keyframe mode) is supported the same way: a retiring
element's window is refined with the SAME fixed-length padded jit the
serial runner uses (odometry.py refine_window) at B=1 — rekeys are
host-decided per element anyway, so the lockstep batch is unaffected
and the cost amortizes over the keyframe lifetime.  Multi-keyframe
mode and TrackingNet rescue stay on the serial runner (they thread
per-element state across windows that lockstep cannot batch).

Shape discipline: all S sequences are stepped for ``min(len_s)`` ticks
with static (S, ...) shapes — one jit signature for the whole run.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from banet_tpu.config import KeyframeConfig
from banet_tpu.data.points import select_points
from banet_tpu.eval.trajectory import Trajectory
from banet_tpu.geometry.camera import Intrinsics


@dataclass
class BatchStats:
    num_frames: int = 0
    num_keyframes: int = 0
    rekeys: List[int] = field(default_factory=list)
    window_refinements: int = 0


class BatchedOdometryRunner:
    """Lockstep odometry over S equal-tick sequences.

    ``tracker``: a TwoViewTracker (its model/variables are reused; the
    batched jits live here so the serial tracker's signatures stay
    warm-cache-compatible)."""

    def __init__(self, tracker, keyframe_cfg: KeyframeConfig = None,
                 num_points: int = 1024,
                 texture_threshold: float = 120.0, seed: int = 0,
                 window_ba: bool = False, window_max_frames: int = 4,
                 window_iters: int = 3):
        self.tracker = tracker
        self.model = tracker.model
        self.variables = tracker.variables
        self.kf = keyframe_cfg or KeyframeConfig()
        self.num_points = num_points
        self.texture_threshold = texture_threshold
        self.window_ba = window_ba
        self.window_max_frames = window_max_frames
        self.window_iters = window_iters
        # One generator PER ELEMENT (created in run()): element i's
        # point-selection stream is then identical to a serial
        # OdometryRunner with the same seed, so batched == serial
        # per-element (asserted in tests/test_batch_odometry.py).
        self.seed = seed

        model = self.model

        @jax.jit
        def _features(variables, imgs):
            return model.apply(variables, imgs, method=model.features)

        @jax.jit
        def _sample_feats(variables, feats, pts):
            return model.apply(variables, feats, pts,
                               method=model.sample_ref_features)

        @jax.jit
        def _track_cached(variables, ref_sampled, imgs, k, pts, d,
                          R0, t0):
            intr = Intrinsics.from_array(k)
            R, t, aux = model.apply(
                variables, ref_sampled, imgs, intr, pts, d, R0, t0,
                method=model.pose_track_cached)
            return R, t, aux.keep_ratio

        self._features = _features
        self._sample_feats = _sample_feats
        self._track_cached = _track_cached

        if window_ba:
            window_iters_ = self.window_iters

            @jax.jit
            def _refine(variables, img_key, imgs_tgt, k, pts, fmask,
                        Rs0, ts0):
                intr = Intrinsics.from_array(k)
                out = model.apply(variables, img_key, imgs_tgt, intr,
                                  pts, num_iters=window_iters_,
                                  frame_mask=fmask, Rs0=Rs0, ts0=ts0,
                                  method=model.window_bundle_adjust)
                return out["Rs"], out["ts"]

            self._refine = _refine

    def run(self, sequences: Sequence[Sequence[Tuple[float, np.ndarray,
                                                     np.ndarray]]],
            intrinsics: Sequence[np.ndarray]
            ) -> Tuple[List[Trajectory], BatchStats]:
        """``sequences``: S lists of (timestamp, rgb, depth) frames;
        ``intrinsics``: S arrays [fx, fy, cx, cy].  Returns S
        world-from-camera trajectories + stats."""
        S = len(sequences)
        ticks = min(len(s) for s in sequences)
        stats = BatchStats(rekeys=[0] * S)
        rngs = [np.random.default_rng(self.seed) for _ in range(S)]

        k_arr = np.stack([np.asarray(i, np.float32).ravel()[:4]
                          for i in intrinsics])
        # Per-element keyframe state (host side).
        key_pose_cw = [np.eye(4) for _ in range(S)]
        key_time = [None] * S
        key_imgs = [None] * S
        pose_logs = [[] for _ in range(S)]
        stamp_logs = [[] for _ in range(S)]
        # (pose-log index, image) of frames tracked vs element i's
        # keyframe (only the last window_max_frames are refined, so
        # only those are kept).
        window_bufs = [[] for _ in range(S)]

        def refine_element(i):
            """Serial-parity single-mode window refinement of element
            i's retiring keyframe window (odometry.py refine_window);
            returns the refined camera-from-world pose of the last
            frame, or None if there is nothing to refine."""
            if not (self.window_ba and window_bufs[i]):
                return None
            frames_w = window_bufs[i][-self.window_max_frames:]
            imgs = np.stack([img for _, img in frames_w])
            n_valid = len(frames_w)
            fmask = np.zeros((self.window_max_frames,), np.float32)
            fmask[:n_valid] = 1.0
            if n_valid < self.window_max_frames:
                pad = np.repeat(imgs[-1:],
                                self.window_max_frames - n_valid, axis=0)
                imgs = np.concatenate([imgs, pad], axis=0)
            # Warm-start from the TRACKED per-frame poses relative to
            # the keyframe (from-identity window BA undoes good
            # tracking; banet.window_bundle_adjust docstring).
            key_inv = np.linalg.inv(key_pose_cw[i])
            Rf0, tf0 = [], []
            for ti, _img in frames_w:
                Tf = (pose_logs[i][ti] @ key_inv).astype(np.float32)
                Rf0.append(Tf[:3, :3])
                tf0.append(Tf[:3, 3])
            while len(Rf0) < self.window_max_frames:
                Rf0.append(Rf0[-1])
                tf0.append(tf0[-1])
            Rs, ts_ = self._refine(
                self.variables, key_imgs[i], imgs,
                k_arr[i:i + 1], pts[i][None], fmask,
                np.stack(Rf0), np.stack(tf0))
            Rs, ts_ = np.asarray(Rs), np.asarray(ts_)
            stats.window_refinements += 1
            last_pose = None
            for fi, (ti, _img) in enumerate(frames_w):
                rel = np.eye(4)
                rel[:3, :3] = Rs[fi]
                rel[:3, 3] = ts_[fi]
                refined = rel @ key_pose_cw[i]
                pose_logs[i][ti] = refined
                last_pose = refined
            return last_pose

        pts = np.zeros((S, self.num_points, 2), np.float32)
        dep = np.zeros((S, self.num_points), np.float32)
        ref_sampled = None  # list of (S, N, C) per level
        initR = np.tile(np.eye(3, dtype=np.float32), (S, 1, 1))
        initT = np.zeros((S, 3), np.float32)

        def rekey(i, rgb, depth, ts):
            nonlocal ref_sampled
            p, d = select_points(rgb, depth, self.num_points,
                                 self.texture_threshold, rng=rngs[i])
            pts[i] = np.asarray(p, np.float32).reshape(-1, 2)
            dep[i] = np.asarray(d, np.float32).reshape(-1)
            feats_i = self._features(self.variables,
                                     jnp.asarray(rgb)[None])
            samp = self._sample_feats(self.variables, feats_i,
                                      jnp.asarray(pts[i])[None])
            if ref_sampled is None:
                ref_sampled = [
                    jnp.zeros((S,) + tuple(x.shape[1:]), x.dtype)
                    for x in samp]
            ref_sampled = [r.at[i].set(x[0]) for r, x in
                           zip(ref_sampled, samp)]
            key_time[i] = ts
            key_imgs[i] = np.asarray(rgb, np.float32)
            initR[i] = np.eye(3, dtype=np.float32)
            initT[i] = 0.0
            stats.num_keyframes += 1

        # Tick 0: everyone keys on their first frame.
        for i, seq in enumerate(sequences):
            ts, rgb, depth = seq[0]
            rekey(i, rgb, depth, ts)
            stamp_logs[i].append(ts)
            pose_logs[i].append(key_pose_cw[i].copy())
            stats.num_frames += 1

        for t_idx in range(1, ticks):
            frames = [seq[t_idx] for seq in sequences]
            imgs = jnp.asarray(np.stack(
                [np.asarray(f[1], np.float32) for f in frames]))
            R, t, keep = self._track_cached(
                self.variables, ref_sampled, imgs,
                jnp.asarray(k_arr), jnp.asarray(pts), jnp.asarray(dep),
                jnp.asarray(initR), jnp.asarray(initT))
            R = np.asarray(R)
            t = np.asarray(t)
            keep = np.asarray(keep)
            for i, (ts, rgb, depth) in enumerate(frames):
                rel = np.eye(4)
                rel[:3, :3] = R[i]
                rel[:3, 3] = t[i]
                pose_cw = rel @ key_pose_cw[i]
                stamp_logs[i].append(ts)
                pose_logs[i].append(pose_cw)
                if self.window_ba:
                    window_bufs[i].append(
                        (len(pose_logs[i]) - 1,
                         np.asarray(rgb, np.float32)))
                    del window_bufs[i][:-self.window_max_frames]
                stats.num_frames += 1
                if (keep[i] < self.kf.min_keep_ratio
                        or (ts - key_time[i]) > self.kf.max_time_gap):
                    # Refine the retiring window BEFORE rekey()
                    # overwrites this element's keyframe state (points
                    # + image); the refined last frame anchors the new
                    # keyframe, exactly as in the serial runner.
                    refined_last = refine_element(i)
                    if refined_last is not None:
                        pose_cw = refined_last
                    window_bufs[i] = []
                    key_pose_cw[i] = pose_cw
                    rekey(i, rgb, depth, ts)
                    stats.rekeys[i] += 1
                else:
                    initR[i] = R[i]
                    initT[i] = t[i]

        for i in range(S):  # close out the final open windows
            refine_element(i)
        trajs = []
        for i in range(S):
            poses_wc = [np.linalg.inv(T) for T in pose_logs[i]]
            trajs.append(Trajectory(np.asarray(stamp_logs[i]),
                                    np.asarray(poses_wc)))
        return trajs, stats
