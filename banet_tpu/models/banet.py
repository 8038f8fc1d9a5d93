"""The flagship BANet model: encoder + pyramid + depth-basis decoder +
differentiable BA layers, as one Flax module.

This is the TPU-native re-design of the reference's full graph
(SURVEY.md §3.1-3.3): where the reference wires DRN -> Pyramid ->
track/BundleResize inside a TF1 session (legacy/ba.py:441-468,
bundlenet.py:280-399), here one ``nn.Module`` owns the submodules and
exposes pure methods; ``module.apply`` + ``jax.jit`` replaces graph
construction + ``session.run``.

Methods:
  features(images)        -> pyramid feature maps, coarse -> fine
  depth_basis(images)     -> (init depth, K-channel basis) at 1/2 res
  pose_track(...)         -> CameraResize equivalent (bundlenet.py:280)
  bundle_adjust(...)      -> BundleResize equivalent (bundlenet.py:332)

Pairing is explicit (ref, tgt) arrays rather than the reference's
batch-rotation trick (bundlenet.py:321: pairing frame i with i+B/2 by
rolling the batch — SURVEY.md §7 design translation table).

Damping nets are shared per level between the pose and bundle solvers,
matching the reference's AUTO_REUSE variable scopes ("lambda_<level>_*",
bundlenet.py:168,244).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from banet_tpu.ba.bundle_solver import depth_map_from_basis, \
    solve_bundle_pyramid
from banet_tpu.ba.camera_solver import solve_pose_pyramid
from banet_tpu.config import Config
from banet_tpu.geometry.camera import Intrinsics, backproject
from banet_tpu.models.damping import DampingNet
from banet_tpu.models.dla import DLA
from banet_tpu.models.drn import DRN
from banet_tpu.models.pyramid import FeaturePyramid
from banet_tpu.ops.grad2d import append_spatial_gradient
from banet_tpu.ops.resample import bilinear_sample, make_footprint_map


class BANet(nn.Module):
    cfg: Config

    def setup(self):
        mc = self.cfg.model
        dtype = jnp.bfloat16 if mc.compute_dtype == "bfloat16" else jnp.float32
        self.encoder = DRN(variant=mc.backbone, channels=mc.channels,
                           image_mean=mc.image_mean, image_std=mc.image_std,
                           include_layer1=True, dtype=dtype,
                           pad_mode=mc.conv_pad_mode,
                           stem_s2d=mc.stem_s2d)
        self.fpn = FeaturePyramid(levels=mc.pyramid_levels,
                                  features=mc.pyramid_channels,
                                  convs_per_level=mc.pyramid_convs_per_level,
                                  agg_features=mc.pyramid_agg_channels,
                                  finest_convs=mc.pyramid_finest_convs,
                                  dtype=dtype,
                                  pad_mode=mc.conv_pad_mode,
                                  fold_agg=mc.pyramid_fold_agg)
        self.dla = DLA(normalize_basis=mc.basis_normalized, dtype=dtype)
        self.damping_nets = [
            DampingNet(mc.pyramid_channels,
                       exponent_base=mc.damping_exponent_base,
                       name=f"damping_{i}")
            for i in range(mc.pyramid_levels)
        ]

    # ---------------- feature extraction ----------------

    def backbone(self, images: jnp.ndarray, train: bool = False):
        return self.encoder(images, train)

    def features_from_layers(self, layers: List[jnp.ndarray],
                             train: bool = False) -> List[jnp.ndarray]:
        """Encoder layer list -> pyramid maps coarse -> fine, in
        ``solver_feature_dtype`` (the GN reductions/solves are always
        f32; bf16 maps halve the sampler's gather traffic)."""
        fdt = (jnp.bfloat16
               if self.cfg.model.solver_feature_dtype == "bfloat16"
               else jnp.float32)
        pyr = self.fpn(layers, train)
        return [p.astype(fdt) for p in pyr]

    def features(self, images: jnp.ndarray,
                 train: bool = False) -> List[jnp.ndarray]:
        """(B, H, W, 3) in [0,255] -> pyramid maps coarse -> fine."""
        return self.features_from_layers(self.encoder(images, train),
                                         train)

    def depth_basis_from_layers(self, layers: List[jnp.ndarray],
                                train: bool = False):
        return self.dla(layers[:5], train)

    def depth_basis(self, images: jnp.ndarray, train: bool = False):
        """(B, H, W, 3) -> (depth (B,H/2,W/2,1), basis (B,H/2,W/2,K))."""
        return self.depth_basis_from_layers(self.encoder(images, train),
                                            train)

    # ---------------- solver plumbing ----------------

    def _target_stack(self, feats):
        """Per-level target map in the configured sampler layout:
        3C grad-map stack ("gradmap"), 4C footprint rows ("footprint"),
        or the raw map itself ("direct" — 4-tap sample with interpolant
        gradients, no prebuilt stack; ops/resample.py).
        Returns (stack, sampler selector for warp_residuals)."""
        mode = self.cfg.solver.sampler
        if mode == "direct":
            return feats, "direct"
        if mode == "footprint":
            return (make_footprint_map(feats),
                    (feats.shape[1], feats.shape[2]))
        return append_spatial_gradient(feats), None

    def _level_inputs(self, feats_ref, feats_tgt, points, intr, levels):
        """Per-level (sampled ref feats, tgt stacks, intrinsics,
        footprint shapes).

        ``levels`` indexes the coarse->fine pyramid; level i sits at
        scale 2^(L-1-i) (reference bundlenet.py:309-315)."""
        L = self.cfg.model.pyramid_levels
        ref_l, tgt_l, intr_l, fp_l = [], [], [], []
        for lvl in levels:
            scale = 2 ** (L - 1 - lvl)
            pts = points / scale
            ref_l.append(bilinear_sample(feats_ref[lvl], pts[..., 0],
                                         pts[..., 1]))
            stack, fp = self._target_stack(feats_tgt[lvl])
            tgt_l.append(stack)
            fp_l.append(fp)
            intr_l.append(intr.scale(1.0 / scale))
        return ref_l, tgt_l, intr_l, fp_l

    def _fused_pose_solve(self, ref_l, tgt_l, rays, point_depths, R0,
                          t0, intr, levels):
        """Pose pyramid via the fused Pallas iteration kernel
        (cfg.solver.fused_tail; ops/pallas_gn_tail.py).  Returns the
        same (R, t, aux) contract as solve_pose_pyramid with the aux
        fields the kernel reports (keep_ratio, lam, accepted)."""
        from banet_tpu.ba.camera_solver import PoseStepAux
        from banet_tpu.ba.fused_level import solve_pose_pyramid_fused

        params = self.variables["params"]
        mlps = [params[f"damping_{lvl}"] for lvl in levels]
        L = self.cfg.model.pyramid_levels
        scales = [1.0 / 2 ** (L - 1 - lvl) for lvl in levels]
        exp_base = self.cfg.model.damping_exponent_base
        cfg_s = self.cfg.solver
        renorm = cfg_s.renormalize_residual

        def one(refs, tgts, rays1, depth1, R01, t01, fx, fy, cx, cy):
            intr_l = [Intrinsics(fx * s, fy * s, cx * s, cy * s)
                      for s in scales]
            return solve_pose_pyramid_fused(
                refs, tgts, rays1, depth1, R01, t01, intr_l, mlps,
                cfg_s, renormalize_residual=renorm, exp_base=exp_base)

        R, t, state = jax.vmap(one)(
            tuple(ref_l), tuple(tgt_l), rays, point_depths, R0, t0,
            intr.fx, intr.fy, intr.cx, intr.cy)
        z = jnp.zeros_like(state[:, 0, 0])
        budget = float(sum(cfg_s.level_iters[:len(levels)]))
        aux = PoseStepAux(
            accepted=state[:, 0, 4], dw=z, dt=z,
            residual_before=state[:, 0, 0],
            residual_after=state[:, 0, 0],
            keep_ratio=state[:, 0, 5], lam=state[:, 0, 3],
            iters_run=jnp.full_like(z, budget))  # fused = fixed budget
        return R, t, aux

    def _pair_encoder(self, image_ref, image_tgt, train: bool):
        """Encode BOTH images of a cold pair in ONE batched call.

        The B=1 encoder leaves most of the MXU idle (measured 17.6% of
        bf16 peak vs 25% at B=8 — artifacts/PROFILE_r03); stacking the
        pair doubles the work per launch for the same weights-read.
        Inference-only: under ``train`` BatchNorm batch statistics
        would couple the two images, so training keeps separate calls
        (VERDICT r3 item 5: batch the cold pair's two pyramids).
        """
        if train or image_ref.shape != image_tgt.shape:
            return (self.encoder(image_ref, train),
                    self.encoder(image_tgt, train))
        B = image_ref.shape[0]
        layers = self.encoder(
            jnp.concatenate([image_ref, image_tgt], axis=0), train)
        return ([l[:B] for l in layers], [l[B:] for l in layers])

    def _damping_fns(self, levels):
        fns = []
        for lvl in levels:
            net = self.damping_nets[lvl]
            if self.is_initializing():
                # Touch the net outside the solver's lax.scan so params
                # are created eagerly; creating them inside the scan body
                # leaks tracers out of the scan trace.
                net(jnp.zeros((1, self.cfg.model.pyramid_channels)))
            interp = jax.default_backend() != "tpu"
            use_pallas = (self.cfg.solver.fused_damping
                          and not self.is_initializing()
                          and (not interp
                               or self.cfg.solver.fused_damping_interpret))
            if use_pallas:
                # One Pallas program instead of ~12 small XLA ops per
                # iteration (ops/pallas_damping.py); inference-only —
                # the kernel has no VJP, so trainers keep the knob off.
                # On non-TPU backends the flag falls through to the
                # numerically identical Flax path (interpret mode is a
                # parity-test device, far too slow for CPU inference).
                from banet_tpu.ops.pallas_damping import damping_pallas

                params = net.variables["params"]
                fns.append(functools.partial(
                    damping_pallas, params,
                    exponent_base=self.cfg.model.damping_exponent_base,
                    interpret=interp))
            else:
                fns.append(net)
        return fns

    # ---------------- BA layers ----------------

    def pose_track(self, image_ref: jnp.ndarray, image_tgt: jnp.ndarray,
                   intr: Intrinsics, points: jnp.ndarray,
                   point_depths: jnp.ndarray,
                   R0: Optional[jnp.ndarray] = None,
                   t0: Optional[jnp.ndarray] = None,
                   train: bool = False,
                   feats_ref: Optional[List[jnp.ndarray]] = None,
                   feats_tgt: Optional[List[jnp.ndarray]] = None,
                   return_per_level: bool = False):
        """Coarse-to-fine pose-only tracking (CameraResize equivalent,
        reference bundlenet.py:280-329, without the train-crop remap —
        apply geometry.crop_remap upstream when training on crops).

        Args:
          image_ref/image_tgt: (B, H, W, 3) uint8-range images.
          intr: batched Intrinsics for the full-resolution grid.
          points: (B, N, 2) full-res pixel coords in the reference view.
          point_depths: (B, N) depths at the points (sensor depth in the
            tracker; sampled net depth in training).
          feats_ref/feats_tgt: optional precomputed pyramids (one
            encoder/FPN pass per image per step when the caller also
            runs bundle_adjust — see __call__).
        Returns: (R, t, aux) — aux.keep_ratio is the keyframe health
          signal.
        """
        B = image_ref.shape[0]
        if R0 is None:
            R0 = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
        if t0 is None:
            t0 = jnp.zeros((B, 3))
        if feats_ref is None and feats_tgt is None and not train \
                and image_ref.shape == image_tgt.shape:
            # One B=2 encoder+FPN pass for the cold pair (see
            # _pair_encoder docstring for why, and why not in train).
            both = self.features(
                jnp.concatenate([image_ref, image_tgt], axis=0), train)
            feats_ref = [f[:B] for f in both]
            feats_tgt = [f[B:] for f in both]
        if feats_ref is None:
            feats_ref = self.features(image_ref, train)
        if feats_tgt is None:
            feats_tgt = self.features(image_tgt, train)
        levels = list(range(self.cfg.model.pyramid_levels))
        ref_l, tgt_l, intr_l, fp_l = self._level_inputs(
            feats_ref, feats_tgt, points, intr, levels)
        rays = backproject(points, intr,
                           normalized=self.cfg.geometry.normalized_rays)
        return solve_pose_pyramid(
            ref_l, tgt_l, rays, point_depths, R0, t0, intr_l,
            self._damping_fns(levels), self.cfg.solver,
            renormalize_residual=self.cfg.solver.renormalize_residual,
            footprint_hws=fp_l, return_per_level=return_per_level)

    def sample_ref_features(self, feats_ref: List[jnp.ndarray],
                            points: jnp.ndarray) -> List[jnp.ndarray]:
        """Keyframe-side per-level point features — computed once per
        keyframe and cached by the tracker (the reference rebuilds both
        pyramids every tracked frame, legacy/ba.py:447-459; caching the
        keyframe side halves the per-frame conv cost)."""
        L = self.cfg.model.pyramid_levels
        out = []
        for lvl in range(L):
            scale = 2 ** (L - 1 - lvl)
            pts = points / scale
            out.append(bilinear_sample(feats_ref[lvl], pts[..., 0],
                                       pts[..., 1]))
        return out

    def pose_track_cached(self, ref_sampled: List[jnp.ndarray],
                          image_tgt: jnp.ndarray, intr: Intrinsics,
                          points: jnp.ndarray, point_depths: jnp.ndarray,
                          R0: Optional[jnp.ndarray] = None,
                          t0: Optional[jnp.ndarray] = None,
                          train: bool = False,
                          feats_tgt: Optional[List[jnp.ndarray]] = None):
        """pose_track against precomputed keyframe point features
        (from ``sample_ref_features``); only the target pyramid is
        computed here — the steady-state odometry per-frame path.
        ``feats_tgt`` lets the caller supply that pyramid too (the
        tracker computes it in a separate jit so a re-key can reuse
        the just-tracked frame's pyramid as the new keyframe's)."""
        B = image_tgt.shape[0]
        if R0 is None:
            R0 = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
        if t0 is None:
            t0 = jnp.zeros((B, 3))
        if feats_tgt is None:
            feats_tgt = self.features(image_tgt, train)
        levels = list(range(self.cfg.model.pyramid_levels))
        L = self.cfg.model.pyramid_levels
        stacks = [self._target_stack(feats_tgt[lvl]) for lvl in levels]
        tgt_l = [s for s, _ in stacks]
        fp_l = [fp for _, fp in stacks]
        rays = backproject(points, intr,
                           normalized=self.cfg.geometry.normalized_rays)
        if (self.cfg.solver.fused_tail and
                self.cfg.solver.sampler == "direct" and
                not self.is_initializing()):
            return self._fused_pose_solve(ref_sampled, tgt_l, rays,
                                          point_depths, R0, t0, intr,
                                          levels)
        intr_l = [intr.scale(1.0 / 2 ** (L - 1 - lvl)) for lvl in levels]
        return solve_pose_pyramid(
            ref_sampled, tgt_l, rays, point_depths, R0, t0, intr_l,
            self._damping_fns(levels), self.cfg.solver,
            renormalize_residual=self.cfg.solver.renormalize_residual,
            footprint_hws=fp_l)

    def bundle_adjust(self, image_ref: jnp.ndarray, image_tgt: jnp.ndarray,
                      intr: Intrinsics, points: jnp.ndarray,
                      R0: Optional[jnp.ndarray] = None,
                      t0: Optional[jnp.ndarray] = None,
                      train: bool = False,
                      levels: Optional[Tuple[int, ...]] = None,
                      feats_ref: Optional[List[jnp.ndarray]] = None,
                      feats_tgt: Optional[List[jnp.ndarray]] = None,
                      depth_basis_maps: Optional[Tuple[jnp.ndarray,
                                                       jnp.ndarray]] = None):
        """Joint pose + depth BA (BundleResize equivalent, reference
        bundlenet.py:332-399): predict depth + basis for the reference
        frame, then refine pose and basis coefficients on the finest
        pyramid levels.  ``levels`` defaults to the two finest (the
        reference's levels 2..3 of 4, bundlenet.py:376).

        Returns dict with per-level poses, final (R, t, W), the initial
        and refined full depth maps, and the basis.
        """
        B = image_ref.shape[0]
        if levels is None:
            L = self.cfg.model.pyramid_levels
            levels = (L - 2, L - 1)
        if R0 is None:
            R0 = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
        if t0 is None:
            t0 = jnp.zeros((B, 3))

        if feats_ref is None:
            feats_ref = self.features(image_ref, train)
        if feats_tgt is None:
            feats_tgt = self.features(image_tgt, train)
        if depth_basis_maps is None:
            depth_basis_maps = self.depth_basis(image_ref, train)
        depth_map, basis_map = depth_basis_maps

        # Sample init depth (gradient stopped, reference bundlenet.py:341)
        # and basis at the points; the depth/basis maps live at 1/2 res.
        pts_half = points / 2.0
        d0 = bilinear_sample(jax.lax.stop_gradient(depth_map),
                             pts_half[..., 0], pts_half[..., 1])[..., 0]
        # Floor the sampled depth: the ReLU depth head can emit exact
        # zeros (certain for untrained weights), which would put points
        # at the camera center.
        d0 = jnp.maximum(d0, 0.01)
        b = bilinear_sample(basis_map, pts_half[..., 0], pts_half[..., 1])

        ref_l, tgt_l, intr_l, fp_l = self._level_inputs(
            feats_ref, feats_tgt, points, intr, list(levels))
        rays = backproject(points, intr,
                           normalized=self.cfg.geometry.normalized_rays)
        R, t, W, per_level = solve_bundle_pyramid(
            ref_l, tgt_l, rays, d0, b, R0, t0, intr_l,
            self._damping_fns(list(levels)), self.cfg.solver,
            iters_per_level=(1,) * len(levels), footprint_hws=fp_l)
        refined_depth = depth_map_from_basis(depth_map, basis_map, W)
        # Per-level full depth maps, as the reference emits for
        # supervision (bundlenet.py:395-397).
        per_level_depth = [depth_map_from_basis(depth_map, basis_map, Wl)
                           for (_Rl, _tl, Wl) in per_level]
        return dict(R=R, t=t, W=W, per_level=per_level,
                    per_level_depth_maps=per_level_depth,
                    init_depth_map=depth_map, basis_map=basis_map,
                    refined_depth_map=refined_depth)

    def window_bundle_adjust(self, image_key: jnp.ndarray,
                             images_tgt: jnp.ndarray, intr: Intrinsics,
                             points: jnp.ndarray, num_iters: int = 5,
                             level: int = 2, train: bool = False,
                             frame_mask: Optional[jnp.ndarray] = None,
                             Rs0: Optional[jnp.ndarray] = None,
                             ts0: Optional[jnp.ndarray] = None):
        """Keyframe-window BA end-to-end (BASELINE configs #2/#3): the
        network predicts the keyframe's depth + basis, and a joint
        Schur-complement GN solve refines all F frame poses plus the
        shared basis coefficients, with the learned damping net.

        Args:
          image_key: (H, W, 3) keyframe; images_tgt: (F, H, W, 3);
          intr: unbatched-style Intrinsics with shape-(1,) fields;
          points: (1, N, 2) keyframe pixel coords;
          frame_mask: optional (F,) validity — padded frames (used to
            keep the window length static under jit) contribute nothing
            to the joint solve.
        Returns dict(Rs (F,3,3), ts (F,3), W (K,), residual_history,
          refined_depth_map (H/2, W/2)).
        """
        from banet_tpu.ba.window_ba import solve_window_ba

        L = self.cfg.model.pyramid_levels
        scale = 2 ** (L - 1 - level)

        layers_key = self.encoder(image_key[None], train)
        feats_key = self.features_from_layers(layers_key, train)
        depth_map, basis_map = self.depth_basis_from_layers(layers_key,
                                                            train)
        F = images_tgt.shape[0]
        feats_tgt = self.features(images_tgt, train)
        tgt_fg, win_fp = self._target_stack(feats_tgt[level])

        pts = points / scale
        ref_feats = bilinear_sample(feats_key[level], pts[..., 0],
                                    pts[..., 1])[0]        # (N, C)
        pts_half = points / 2.0
        d0 = bilinear_sample(jax.lax.stop_gradient(depth_map),
                             pts_half[..., 0], pts_half[..., 1])[0, :, 0]
        d0 = jnp.maximum(d0, 0.01)
        basis = bilinear_sample(basis_map, pts_half[..., 0],
                                pts_half[..., 1])[0]       # (N, K)
        rays = backproject(points, intr,
                           normalized=self.cfg.geometry.normalized_rays)[0]

        damping = self.damping_nets[level]
        if self.is_initializing():
            damping(jnp.zeros((1, self.cfg.model.pyramid_channels)))
        # Rs0/ts0: warm starts from the caller's per-frame tracked
        # poses — without them the joint solve starts every frame at
        # identity and 5 coarse-level iterations UNDO good tracking
        # (measured: easy-seq ATE 0.0485 from-identity vs 0.0126
        # tracked; root cause of the round-3/4 "window BA hurts"
        # readings — the odometry runner now always warm-starts).
        Rs, ts, W, res_hist = solve_window_ba(
            ref_feats, tgt_fg, rays, d0, basis, intr.scale(1.0 / scale),
            self.cfg.solver, num_iters=num_iters,
            Rs0=Rs0, ts0=ts0,
            lam=self.cfg.solver.bundle_damping_base,
            lam_depth=self.cfg.solver.bundle_damping_base,
            damping_fn=damping, frame_mask=frame_mask,
            footprint=win_fp)
        refined = depth_map_from_basis(depth_map, basis_map,
                                       W[None])[0, ..., 0]
        return dict(Rs=Rs, ts=ts, W=W, residual_history=res_hist,
                    refined_depth_map=refined,
                    init_depth_map=depth_map[0, ..., 0])

    def multi_window_bundle_adjust(self, images_key: jnp.ndarray,
                                   images_tgt: jnp.ndarray,
                                   intr: Intrinsics,
                                   points: jnp.ndarray,
                                   obs_mask: Optional[jnp.ndarray] = None,
                                   Rs_k0: Optional[jnp.ndarray] = None,
                                   ts_k0: Optional[jnp.ndarray] = None,
                                   Rs_f0: Optional[jnp.ndarray] = None,
                                   ts_f0: Optional[jnp.ndarray] = None,
                                   num_iters: int = 5, level: int = 2,
                                   train: bool = False):
        """Joint BA over M keyframes (each with its own predicted depth
        basis) and F target frames — the end-to-end form of
        ba/multi_window_ba.py (BASELINE north star: "partitioning
        keyframes and map blocks ... pose-graph consistency").

        Args:
          images_key: (M, H, W, 3); images_tgt: (F, H, W, 3);
          intr: shape-(1,) Intrinsics; points: (M, N, 2) per-keyframe
          pixel coords; obs_mask: optional (M, F); pose inits are
          cam-from-window (window frame = keyframe 0; keyframe 0's pose
          is the gauge and is pinned).
        Returns dict(Rs_f, ts_f, Rs_k, ts_k, Ws (M, K),
          residual_history).
        """
        from banet_tpu.ba.multi_window_ba import (MultiWindowProblem,
                                                  solve_multi_window_ba)

        M = images_key.shape[0]
        F = images_tgt.shape[0]
        L = self.cfg.model.pyramid_levels
        scale = 2 ** (L - 1 - level)

        layers_key = self.encoder(images_key, train)
        feats_key = self.features_from_layers(layers_key, train)
        depth_map, basis_map = self.depth_basis_from_layers(layers_key,
                                                            train)
        feats_tgt = self.features(images_tgt, train)
        # pair_blocks consumes the 3C grad-stack layout.
        tgt_stack = append_spatial_gradient(feats_tgt[level])

        pts = points / scale
        ref_feats = bilinear_sample(feats_key[level], pts[..., 0],
                                    pts[..., 1])          # (M, N, C)
        pts_half = points / 2.0
        d0 = bilinear_sample(jax.lax.stop_gradient(depth_map),
                             pts_half[..., 0], pts_half[..., 1])[..., 0]
        d0 = jnp.maximum(d0, 0.01)                        # (M, N)
        basis = bilinear_sample(basis_map, pts_half[..., 0],
                                pts_half[..., 1])          # (M, N, K)
        rays = backproject(
            points, intr, normalized=self.cfg.geometry.normalized_rays)

        if obs_mask is None:
            obs_mask = jnp.ones((M, F))
        prob = MultiWindowProblem(
            ref_feats=ref_feats, rays=rays, init_depth=d0, basis=basis,
            tgt_fg=tgt_stack, obs_mask=obs_mask)

        damping = self.damping_nets[level]
        if self.is_initializing():
            damping(jnp.zeros((1, self.cfg.model.pyramid_channels)))
        Rs_f, ts_f, Rs_k, ts_k, Ws, hist = solve_multi_window_ba(
            prob, intr.scale(1.0 / scale), self.cfg.solver,
            num_iters=num_iters,
            lam=self.cfg.solver.bundle_damping_base,
            lam_depth=self.cfg.solver.bundle_damping_base,
            Rs_f0=Rs_f0, ts_f0=ts_f0, Rs_k0=Rs_k0, ts_k0=ts_k0,
            damping_fn=damping)
        return dict(Rs_f=Rs_f, ts_f=ts_f, Rs_k=Rs_k, ts_k=ts_k, Ws=Ws,
                    residual_history=hist)

    def monocular_bundle(self, image_ref, image_tgt, intr,
                         points: jnp.ndarray, train: bool = False):
        """Monocular two-view pipeline: pose first, then bundle
        (reference CameraResize -> BundleResize order,
        bundlenet.py:280-399).  No sensor depth: the depth head's
        prediction supplies the pose cascade's point depths, the full
        coarse-to-fine pose solve absorbs the baseline, and the joint
        (6+K) bundle refinement starts from the TRACKED pose.  Running
        the bundle step from identity instead cannot absorb a real
        baseline, and on small baselines the two-view scale gauge makes
        identity-init refinement unidentifiable (ba/bundle_solver.py).

        One encoder pass per image, shared across FPN + DLA (and one
        B=2 batched pass for the pair at inference — _pair_encoder).
        Returns the ``bundle_adjust`` dict + pose_R/pose_t/pose_aux.
        """
        layers_ref, layers_tgt = self._pair_encoder(image_ref,
                                                    image_tgt, train)
        feats_ref = self.features_from_layers(layers_ref, train)
        feats_tgt = self.features_from_layers(layers_tgt, train)
        db = self.depth_basis_from_layers(layers_ref, train)
        pts_half = points / 2.0
        d0 = bilinear_sample(jax.lax.stop_gradient(db[0]),
                             pts_half[..., 0], pts_half[..., 1])[..., 0]
        d0 = jnp.maximum(d0, 0.01)
        R, t, aux = self.pose_track(image_ref, image_tgt, intr, points,
                                    d0, train=train,
                                    feats_ref=feats_ref,
                                    feats_tgt=feats_tgt)
        out = self.bundle_adjust(image_ref, image_tgt, intr, points,
                                 R0=R, t0=t, train=train,
                                 feats_ref=feats_ref,
                                 feats_tgt=feats_tgt,
                                 depth_basis_maps=db)
        out.update(pose_R=R, pose_t=t, pose_aux=aux)
        return out

    def __call__(self, image_ref, image_tgt, intr, points, train=False,
                 point_depths=None):
        """Init/forward path touching every submodule (all pyramid-level
        damping nets and the decoder), so ``module.init`` creates the
        complete parameter tree — and the TRAINING path: the trainer
        runs this full pose-then-bundle cascade so every pyramid level's
        solve (not just bundle_adjust's two finest) is supervised; the
        coarse levels are what give the tracker its convergence basin
        (per-level supervision as in reference bundlenet.py:395-397).

        Runs the encoder exactly once per image and shares the layer
        list between the FPN and the DLA decoder, so the full
        pose-then-bundle step costs 2 encoder passes, not 5.

        ``point_depths``: (B, N) depths at ``points`` (sensor/GT depth —
        the tracker's operating condition).  Defaults to ones, which is
        only meaningful for ``module.init``."""
        B, N = points.shape[0], points.shape[1]
        if point_depths is None:
            point_depths = jnp.ones((B, N), dtype=jnp.float32)
        layers_ref, layers_tgt = self._pair_encoder(image_ref,
                                                    image_tgt, train)
        feats_ref = self.features_from_layers(layers_ref, train)
        feats_tgt = self.features_from_layers(layers_tgt, train)
        db = self.depth_basis_from_layers(layers_ref, train)
        R, t, aux, pose_levels = self.pose_track(
            image_ref, image_tgt, intr, points, point_depths,
            train=train, feats_ref=feats_ref, feats_tgt=feats_tgt,
            return_per_level=True)
        out = self.bundle_adjust(image_ref, image_tgt, intr, points,
                                 R0=R, t0=t, train=train,
                                 feats_ref=feats_ref,
                                 feats_tgt=feats_tgt,
                                 depth_basis_maps=db)
        out.update(pose_R=R, pose_t=t, pose_aux=aux,
                   pose_per_level=pose_levels)
        return out
