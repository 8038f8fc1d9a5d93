"""Hybrid tracker: learned direct regression to initialize, GN to refine.

Combines the two model families (ROADMAP.md item 5): the DeepTAM-class
``TrackingNet`` (models/tracking_net.py) predicts a robust coarse pose
from rendered depth hypotheses — large basin of attraction, limited
precision — and the BANet feature-metric GN solver polishes it —
quadratic convergence near the optimum, small basin.  This is the
classical initialize-then-refine split; the reference ships the two
systems side by side (BundleNet vs the vendored DeepTAM baseline)
without combining them.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np

from banet_tpu.config import Config, default_config
from banet_tpu.geometry.camera import Intrinsics
from banet_tpu.models.banet import BANet
from banet_tpu.models.tracking_net import TrackingNet
from banet_tpu.tracking.tracker import TwoViewTracker, _batched


class HybridTracker:
    def __init__(self, cfg: Config, banet_variables, tnet: TrackingNet,
                 tnet_variables):
        self.gn = TwoViewTracker(cfg, banet_variables)
        self.tnet = tnet
        self.tnet_variables = tnet_variables

        @jax.jit
        def _init_pose(variables, key_img, key_depth, cur_img, k):
            intr = Intrinsics.from_array(k)
            out = tnet.apply(variables, key_img, key_depth, cur_img,
                             intr)
            return out.R, out.t, out.motion_std

        self._init_pose = _init_pose

    @classmethod
    def initialize(cls, cfg: Optional[Config] = None, seed: int = 0,
                   image_size: Tuple[int, int] = (256, 320),
                   num_points: int = 1024,
                   num_motion_samples: int = 64) -> "HybridTracker":
        cfg = cfg or default_config()
        base = TwoViewTracker.initialize(cfg, seed, image_size,
                                         num_points)
        import jax.numpy as jnp

        H, W = image_size
        tnet = TrackingNet(levels=3, num_samples=num_motion_samples,
                           normalized_rays=False)
        k = jax.random.PRNGKey(seed + 1)
        img = jnp.zeros((1, H, W, 3))
        depth = jnp.ones((1, H, W))
        intr = Intrinsics(jnp.array([W * 0.8]), jnp.array([W * 0.8]),
                          jnp.array([W / 2.0]), jnp.array([H / 2.0]))
        tv = tnet.init(k, img, depth, img, intr)
        return cls(cfg, base.variables, tnet, tv)

    def track(self, image1, image2, intrinsics, points, depths,
              key_depth_map=None):
        """Two-stage track: regression init -> GN refinement.

        ``key_depth_map``: (H, W) dense keyframe depth for the
        regression stage's renders; defaults to a constant plane at the
        median point depth when only sparse depths are available.
        Returns (R, t, keep_ratio, init_R, init_t, motion_std).
        """
        img1 = np.asarray(_batched(image1, 4), np.float32)
        img2 = np.asarray(_batched(image2, 4), np.float32)
        d = np.asarray(depths, np.float32).reshape(1, -1)
        if key_depth_map is None:
            key_depth_map = np.full(img1.shape[1:3],
                                    float(np.median(d)), np.float32)
        kd = np.asarray(_batched(key_depth_map, 3), np.float32)
        k = np.asarray(intrinsics, np.float32).reshape(-1, 4)
        R0, t0, std = self._init_pose(self.tnet_variables, img1, kd,
                                      img2, k)
        R, t, keep = self.gn.track(image1, image2, intrinsics, points,
                                   depths, np.asarray(R0),
                                   np.asarray(t0))
        return (R, t, keep, np.asarray(R0), np.asarray(t0),
                np.asarray(std))
