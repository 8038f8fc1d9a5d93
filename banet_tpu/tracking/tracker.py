"""Two-view tracker: the user-facing tracking API.

Equivalent of the reference ``Tracker`` (legacy/ba.py:441-482): where it
builds a TF1 graph + InteractiveSession and feeds placeholders, here a
``BANet`` module is bound to parameters and the track function is
``jax.jit``-compiled once per input signature.

Usage:
    tracker = TwoViewTracker(cfg, variables)           # or .initialize()
    R, t, keep_ratio = tracker.track(img1, img2, K, points, depths,
                                     initR, initT)

Inputs mirror trackPY (legacy/ba.py:470-482): numpy arrays, intrinsics
as [fx, fy, cx, cy]; leading batch axes optional (added if missing).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from banet_tpu.config import Config, default_config
from banet_tpu.geometry.camera import Intrinsics
from banet_tpu.models.banet import BANet


class TwoViewTracker:
    def __init__(self, cfg: Config, variables):
        self.cfg = cfg
        self.model = BANet(cfg)
        self.variables = variables

        @jax.jit
        def _track(variables, img1, img2, k, points, depths, R0, t0):
            intr = Intrinsics.from_array(k)
            R, t, aux = self.model.apply(
                variables, img1, img2, intr, points, depths, R0, t0,
                method=self.model.pose_track)
            return R, t, aux.keep_ratio

        @jax.jit
        def _keyframe_features(variables, img, points):
            feats = self.model.apply(variables, img,
                                     method=self.model.features)
            return self.model.apply(variables, feats, points,
                                    method=self.model.sample_ref_features)

        @jax.jit
        def _features(variables, img):
            return self.model.apply(variables, img,
                                    method=self.model.features)

        @jax.jit
        def _sample_feats(variables, feats, points):
            return self.model.apply(variables, feats, points,
                                    method=self.model.sample_ref_features)

        @jax.jit
        def _track_cached(variables, ref_sampled, feats_tgt, img2, k,
                          points, depths, R0, t0):
            intr = Intrinsics.from_array(k)
            R, t, aux = self.model.apply(
                variables, ref_sampled, img2, intr, points, depths, R0,
                t0, feats_tgt=feats_tgt,
                method=self.model.pose_track_cached)
            # residual_before is the finest level's accepted-pose
            # feature residual — the solve-quality signal the hybrid
            # rescue compares two inits by (odometry.py).
            return R, t, aux.keep_ratio, aux.residual_before

        @jax.jit
        def _bundle(variables, img1, img2, k, points):
            intr = Intrinsics.from_array(k)
            out = self.model.apply(variables, img1, img2, intr, points,
                                   method=self.model.monocular_bundle)
            return (out["R"], out["t"], out["refined_depth_map"],
                    out["init_depth_map"])

        self._track = _track
        self._keyframe_features = _keyframe_features
        self._features = _features
        self._sample_feats = _sample_feats
        self._track_cached = _track_cached
        self._bundle = _bundle
        self._kf = None  # (ref_sampled, k, points, depths)
        self._last_tgt_feats = None  # device pyramid of last track_frame
        self._last_tgt_fp = None     # content fingerprint of that frame

    @classmethod
    def initialize(cls, cfg: Optional[Config] = None, seed: int = 0,
                   image_size: Tuple[int, int] = (256, 320),
                   num_points: int = 1024) -> "TwoViewTracker":
        """Fresh (untrained) tracker — e.g. for benchmarks and tests."""
        cfg = cfg or default_config()
        model = BANet(cfg)
        H, W = image_size
        k = jax.random.PRNGKey(seed)
        img = jnp.zeros((1, H, W, 3))
        intr = Intrinsics(jnp.array([W * 0.8]), jnp.array([W * 0.8]),
                          jnp.array([W / 2.0]), jnp.array([H / 2.0]))
        pts = jnp.full((1, num_points, 2), 8.0)
        variables = model.init(k, img, img, intr, pts)
        return cls(cfg, variables)

    def track(self, image1, image2, intrinsics, points, depths,
              initR=None, initT=None):
        """Returns (R (B,3,3), t (B,3), keep_ratio (B,)) as numpy.

        Accepts unbatched (H, W, 3) images / (N, 2) points etc. like the
        reference's feed_dict shapes; batches are added as needed.
        """
        img1 = _batched(image1, 4)
        img2 = _batched(image2, 4)
        pts = _batched(np.asarray(points, np.float32), 3)
        d = np.asarray(depths, np.float32)
        if d.ndim == 3:  # (B, N, 1) reference layout
            d = d[..., 0]
        d = _batched(d, 2)
        k = np.asarray(intrinsics, np.float32).reshape(-1, 4)
        B = img1.shape[0]
        if initR is None:
            initR = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
        if initT is None:
            initT = np.zeros((B, 3), np.float32)
        initR = _batched(np.asarray(initR, np.float32), 3)
        initT = np.asarray(initT, np.float32).reshape(B, -1)[:, :3]
        R, t, keep = self._track(self.variables, img1, img2, k, pts, d,
                                 initR, initT)
        return np.asarray(R), np.asarray(t), np.asarray(keep)


    def track_monocular(self, image1, image2, intrinsics, points=None,
                        num_points: int = 1024):
        """Monocular two-view BA: no sensor depth — the network predicts
        depth + basis for the reference frame and the joint (6+K) solve
        refines pose and depth together (BundleResize path, reference
        bundlenet.py:332-399).

        Returns (R (B,3,3), t (B,3), refined_depth (B,H/2,W/2)) numpy.
        """
        from banet_tpu.data.points import select_textured_points

        img1 = _batched(image1, 4)
        img2 = _batched(image2, 4)
        if points is None:
            points = select_textured_points(np.asarray(image1),
                                            num_points)
        pts = _batched(np.asarray(points, np.float32), 3)
        k = np.asarray(intrinsics, np.float32).reshape(-1, 4)
        R, t, depth, _init = self._bundle(self.variables, img1, img2, k,
                                          pts)
        return np.asarray(R), np.asarray(t), np.asarray(depth[..., 0])

    def bundle_depth(self, image1, image2, intrinsics, points):
        """Monocular two-view BA returning BOTH depth maps: the depth
        head's initial prediction and the basis-refined map
        (init_depth + basis @ W, reference bundlenet.py:397) — the
        quantities the BA-Net paper's depth evaluation scores
        (eval/depth_eval.py).  Returns (init (B,H/2,W/2),
        refined (B,H/2,W/2)) numpy."""
        img1 = _batched(image1, 4)
        img2 = _batched(image2, 4)
        pts = _batched(np.asarray(points, np.float32), 3)
        k = np.asarray(intrinsics, np.float32).reshape(-1, 4)
        _R, _t, refined, init = self._bundle(self.variables, img1, img2,
                                             k, pts)
        return np.asarray(init[..., 0]), np.asarray(refined[..., 0])

    def window_depth(self, image_key, images_tgt, intrinsics, points,
                     num_iters: int = 5):
        """Multi-frame window BA depth: keyframe + F targets with REAL
        baselines make the scale observable (the two-view small-
        baseline pair is near-degenerate in the scale gauge —
        ba/bundle_solver.py), so this is the depth-refinement showcase
        the paper's joint-BA claim is about (final depth = init +
        basis . W, reference bundlenet.py:397, solved over a window as
        in BundleResize across frames).  Returns (init (H/2, W/2),
        refined (H/2, W/2)) numpy."""
        if not hasattr(self, "_window_depth"):
            model = self.model

            import functools

            @functools.partial(jax.jit, static_argnums=(5,))
            def _wd(variables, img_key, imgs_tgt, k, pts, num_iters):
                intr = Intrinsics.from_array(k)
                out = model.apply(variables, img_key, imgs_tgt, intr,
                                  pts, num_iters=num_iters,
                                  method=model.window_bundle_adjust)
                return out["init_depth_map"], out["refined_depth_map"]

            self._window_depth = _wd
        img_key = jnp.asarray(image_key, jnp.float32)
        imgs = jnp.asarray(images_tgt, jnp.float32)
        pts = _batched(np.asarray(points, np.float32), 3)
        k = np.asarray(intrinsics, np.float32).reshape(-1, 4)
        init, refined = self._window_depth(self.variables, img_key,
                                           imgs, k, pts, num_iters)
        return np.asarray(init), np.asarray(refined)

    def set_keyframe(self, image, intrinsics, points, depths,
                     reuse_last_target: bool = False) -> None:
        """Cache the keyframe's per-level point features; subsequent
        ``track_frame`` calls only run the target-image pyramid
        (steady-state odometry path — the reference recomputes both
        pyramids every frame, legacy/ba.py:447-459).

        ``reuse_last_target``: the caller asserts ``image`` IS the
        frame the last ``track_frame`` call tracked (the odometry
        re-key case), so its already-computed pyramid is resampled at
        the new points instead of running the encoder again — re-keys
        become encoder-free."""
        img = _batched(image, 4)
        pts = _batched(np.asarray(points, np.float32), 3)
        d = np.asarray(depths, np.float32)
        if d.ndim == 3:
            d = d[..., 0]
        d = _batched(d, 2)
        k = np.asarray(intrinsics, np.float32).reshape(-1, 4)
        if reuse_last_target and self._last_tgt_feats is not None:
            fp = _fingerprint(image)
            assert (fp == self._last_tgt_fp if fp else
                    image is self._last_tgt_img), \
                "reuse_last_target=True but `image` is not the frame " \
                "the last track_frame call tracked"
            ref_sampled = self._sample_feats(
                self.variables, self._last_tgt_feats, pts)
        else:
            ref_sampled = self._keyframe_features(self.variables, img,
                                                  pts)
        self._kf = (ref_sampled, k, pts, d)

    def track_frame(self, image_tgt, initR=None, initT=None,
                    with_residual: bool = False):
        """Track against the cached keyframe (set_keyframe first).

        Returns (R (B,3,3), t (B,3), keep_ratio (B,)) as numpy; with
        ``with_residual`` also the finest-level accepted-pose feature
        residual (B,) — comparable across inits of the SAME frame."""
        assert self._kf is not None, "call set_keyframe first"
        ref_sampled, k, pts, d = self._kf
        img2 = _batched(image_tgt, 4)
        B = img2.shape[0]
        if initR is None:
            initR = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
        if initT is None:
            initT = np.zeros((B, 3), np.float32)
        initR = _batched(np.asarray(initR, np.float32), 3)
        initT = np.asarray(initT, np.float32).reshape(B, -1)[:, :3]
        # Pyramid in its own jit so a re-key on this frame can reuse it
        # (set_keyframe(reuse_last_target=True)) and a second solve of
        # the SAME frame (hybrid-rescue re-init) skips the encoder;
        # arrays stay on device.
        if image_tgt is getattr(self, "_last_tgt_img", None) \
                and self._last_tgt_feats is not None \
                and _fingerprint(image_tgt) == self._last_tgt_fp:
            feats_tgt = self._last_tgt_feats
        else:
            feats_tgt = self._features(self.variables, img2)
            self._last_tgt_feats = feats_tgt
            self._last_tgt_img = image_tgt
            self._last_tgt_fp = _fingerprint(image_tgt)
        R, t, keep, res = self._track_cached(self.variables, ref_sampled,
                                             feats_tgt, img2, k, pts, d,
                                             initR, initT)
        if with_residual:
            return (np.asarray(R), np.asarray(t), np.asarray(keep),
                    np.asarray(res))
        return np.asarray(R), np.asarray(t), np.asarray(keep)


def _batched(x, ndim: int):
    x = jnp.asarray(x)
    while x.ndim < ndim:
        x = x[None]
    return x


def _fingerprint(image):
    """Cheap content check backing the identity-keyed target cache
    (ADVICE r4): jax arrays are immutable, so identity alone is enough;
    a host numpy array can be mutated in place between track_frame
    calls, so sample ~64 strided elements to catch stale features."""
    if not isinstance(image, np.ndarray):
        return ()
    flat = image.reshape(-1)
    step = max(1, flat.shape[0] // 64)
    return flat[::step].tobytes()
