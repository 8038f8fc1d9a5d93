"""Warp -> sample -> residual/gradient assembly for the GN layers.

One function produces everything a GN step consumes, matching the
"warp_compute" + "warp_conv" blocks of the reference
(bundlenet.py:134-163, legacy/ba.py:238-264):

  1. rotate/scale/translate the reference rays into the target frame and
     project (px, py);
  2. bilinearly sample the target feature-plus-gradient stack (3C
     channels: [f, df/dx, df/dy], built once per level with
     ``append_spatial_gradient``) at (px, py);
  3. residual r = f_tgt(sampled) - f_ref, masked to in-bounds points;
     gradients G = [gx, gy] stacked as (..., C, 2), masked likewise.

Residual sign: the reference's two variants differ (conv1 - conv2 at
bundlenet.py:158 vs conv2 - conv1 at legacy/ba.py:180) and compensate
with opposite Jacobian signs; here J = +d(proj)/d(params) everywhere
(see geometry/jacobians.py) so r = f_tgt - f_ref and the GN step is
delta = -(AtA)^{-1} Atb.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

from banet_tpu.geometry.camera import Intrinsics, warp_points
from banet_tpu.ops.resample import (bilinear_sample_with_mask,
                                    sample_footprint,
                                    sample_with_gradient)


class WarpResult(NamedTuple):
    residual: jnp.ndarray  # (B, N, C) masked residuals
    G: jnp.ndarray         # (B, N, C, 2) masked sampled feature gradients
    mask: jnp.ndarray      # (B, N) in-bounds indicator
    x: jnp.ndarray         # (B, N) normalized target image coords X/Z
    y: jnp.ndarray         # (B, N)
    z: jnp.ndarray         # (B, N) warped depth Z
    rotated_rays: jnp.ndarray  # (B, N, 3) R @ rays (depth-Jacobian input)

    @property
    def keep_ratio(self) -> jnp.ndarray:
        """Fraction of in-bounds points — the tracking-health metric the
        keyframe policy thresholds at 0.8 (reference legacy/ba.py:214,
        seq_example.py:190)."""
        return jnp.mean(self.mask, axis=-1)

    def avg_abs_residual(self, renormalize: bool = True) -> jnp.ndarray:
        """(B, C) mean |residual| per channel, the damping-net input.

        With ``renormalize`` the mean runs over valid points only
        (legacy/ba.py:257,268 multiplies by npixels/sum(mask)); without,
        it is a plain mean over all points (bundlenet.py:167)."""
        m = jnp.mean(jnp.abs(self.residual), axis=-2)
        if renormalize:
            n = self.mask.shape[-1]
            valid = jnp.sum(self.mask, axis=-1, keepdims=True)
            m = m * (n / jnp.maximum(valid, 1.0))
        return m


def warp_residuals(ref_feats: jnp.ndarray, tgt_feats_grad: jnp.ndarray,
                   rays: jnp.ndarray, depth: jnp.ndarray, R: jnp.ndarray,
                   t: jnp.ndarray, intr: Intrinsics,
                   footprint: Optional[Tuple[int, int]] = None
                   ) -> WarpResult:
    """Warp points and assemble masked residuals + sampled gradients.

    Args:
      ref_feats: (B, N, C) reference-view features at the sampled points.
      tgt_feats_grad: (B, H, W, 3C) target [features, gradx, grady] —
        or, when ``footprint`` is given, the (B, (H+2)(W+2), 4C)
        footprint map from ``ops.resample.make_footprint_map``.
      rays: (B, N, 3) reference-pixel rays (either convention).
      depth: (B, N) per-point depth (distance along ray if normalized).
      R, t: (B, 3, 3), (B, 3) current pose estimate.
      intr: level-scaled intrinsics.
      footprint: sampler selector — None: 4-tap sample of the 3C
        grad-map stack (reference grad_fixed semantics); (H, W): ONE
        row gather from the level's footprint map; "direct": 4-tap
        sample of the RAW C-channel map with gradients from the same
        taps (no prebuilt stack — the fastest end-to-end mode).  The
        footprint/direct gradients are the exact derivative of the
        bilinear interpolant (see ops/resample.py).
    """
    C = ref_feats.shape[-1]
    px, py, x, y, z, Rp = warp_points(rays, depth, R, t, intr)
    if footprint == "direct":
        f, gx, gy, mask = sample_with_gradient(tgt_feats_grad, px, py)
    elif footprint is not None:
        f, gx, gy, mask = sample_footprint(tgt_feats_grad, footprint[0],
                                           footprint[1], px, py)
    else:
        sampled, mask = bilinear_sample_with_mask(tgt_feats_grad, px, py)
        f = sampled[..., :C]
        gx = sampled[..., C:2 * C]
        gy = sampled[..., 2 * C:3 * C]
    m1 = mask[..., None]
    residual = (f - ref_feats) * m1
    G = jnp.stack([gx, gy], axis=-1) * m1[..., None]
    return WarpResult(residual=residual, G=G, mask=mask, x=x, y=y, z=z,
                      rotated_rays=Rp)
