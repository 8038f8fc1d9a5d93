"""Forward-warp rendering with z-buffering, and nonfinite scrubbing.

Pure-JAX equivalents of the ``lmbspecialops`` native ops the reference's
vendored DeepTAM harness depends on but does not ship (SURVEY.md §2.4
item 6; used at reference models/blocks.py:44-86 and
models/helpers.py:25,192-195):

- ``forward_warp_render`` == ``sops.transfer_key_frame2``: render a
  keyframe's (image, depth) into the current view at a given relative
  pose by splatting every keyframe pixel to its projected target pixel,
  keeping the nearest (z-buffer min) surface;
- ``replace_nonfinite``: NaN/Inf -> value;
- rotation conversions live in geometry/se3.py.

TPU design: the z-buffer is a ``segment_min`` scatter over flattened
target indices — XLA lowers ``jax.ops.segment_min`` to an efficient
sorted-segment reduction; ties at equal depth pick either (the native
op has the same race).  Static shapes, fully jittable/vmappable.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from banet_tpu.geometry.camera import Intrinsics, backproject, warp_points


def replace_nonfinite(x: jnp.ndarray, value: float = 0.0) -> jnp.ndarray:
    """NaN/Inf -> value (sops.replace_nonfinite equivalent)."""
    return jnp.where(jnp.isfinite(x), x, jnp.asarray(value, x.dtype))


def forward_warp_render(
        image: jnp.ndarray, depth: jnp.ndarray, R: jnp.ndarray,
        t: jnp.ndarray, intr: Intrinsics,
        depth_scale: float = 1.0,
        normalized_rays: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Splat (image, depth) through (R, t) into the same-sized view.

    Args:
      image: (B, H, W, C) keyframe values to transport.
      depth: (B, H, W) keyframe depth.
      R, t: (B, 3, 3), (B, 3) target-from-keyframe pose.
      depth_scale: multiply depth before warping (the DeepTAM cascade
        renders at near/far/1.2x depth variants,
        reference models/blocks.py:44-79).
    Returns:
      warped_image (B, H, W, C) — zeros where nothing lands;
      warped_depth (B, H, W) — +inf -> 0 where nothing lands;
      valid_mask   (B, H, W) — 1 where a splat landed.
    """
    B, H, W = depth.shape
    C = image.shape[-1]
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    grid = jnp.stack([xx.ravel(), yy.ravel()], axis=-1)[None]
    grid = jnp.broadcast_to(grid, (B, H * W, 2))
    rays = backproject(grid, intr, normalized=normalized_rays)
    d = depth.reshape(B, H * W) * depth_scale
    px, py, _, _, z, _ = warp_points(rays, d, R, t, intr)

    xi = jnp.round(px).astype(jnp.int32)
    yi = jnp.round(py).astype(jnp.int32)
    inb = ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H) & (z > 1e-6) &
           (d > 1e-6))
    # Out-of-bounds splats go to a trash bin at index H*W.
    idx = jnp.where(inb, jnp.clip(yi, 0, H - 1) * W +
                    jnp.clip(xi, 0, W - 1), H * W)

    big = jnp.asarray(jnp.inf, z.dtype)
    zbuf = jax.vmap(lambda ix, zz: jax.ops.segment_min(
        zz, ix, num_segments=H * W + 1))(idx, jnp.where(inb, z, big))
    zbuf = zbuf[:, :H * W]

    # A pixel's splat wins where its z equals the z-buffer minimum.
    win = inb & (z <= jnp.take_along_axis(zbuf, jnp.clip(idx, 0,
                                                         H * W - 1),
                                          axis=1) + 1e-6)
    widx = jnp.where(win, idx, H * W)

    def scatter_vals(ix, vals):
        # segment_min over each channel with +inf padding keeps exactly
        # the winning splat's value (winners are unique up to z ties).
        return jax.vmap(
            lambda v: jax.ops.segment_min(jnp.where(ix < H * W, v, big),
                                          ix, num_segments=H * W + 1),
            in_axes=-1, out_axes=-1)(vals)[:H * W]

    warped = jax.vmap(scatter_vals)(widx, image.reshape(B, H * W, C))
    landed = jnp.isfinite(zbuf)
    warped = jnp.where(jnp.isfinite(warped), warped, 0.0)
    warped_depth = jnp.where(landed, zbuf, 0.0)
    return (warped.reshape(B, H, W, C), warped_depth.reshape(B, H, W),
            landed.astype(image.dtype).reshape(B, H, W))
