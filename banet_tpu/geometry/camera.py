"""Pinhole camera model: rays, projection, crop/scale intrinsics remaps.

Capability parity with the reference camera handling:

- ``backproject`` — pixel -> homogeneous ray, optionally l2-normalized
  (reference bundlenet.py:112-120 ``computeCoordinates`` normalizes;
  reference legacy/ba.py:27-34 keeps z=1 rays; both supported);
- ``project``/``warp_points`` — the warp X = R p d + t, (px, py) =
  (fx X/Z + cx, fy Y/Z + cy) used in every GN iteration (reference
  bundlenet.py:134-148, legacy/ba.py:238-251);
- ``crop_remap``/``crop_adjusted_intrinsics`` — the train-crop
  coordinate remap and intrinsics adjustment (reference
  bundlenet.py:286-302,337-357: x = 320 (x-4)/312, fx' = fx 40/39,
  cx' = cx 40/39 - 160/39), generalized to arbitrary sizes.

``Intrinsics`` is a pytree so it can be traced, vmapped, and sharded
like any other array bundle; fields broadcast over leading batch axes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class Intrinsics:
    """Pinhole intrinsics (fx, fy, cx, cy), each of any broadcastable shape."""

    def __init__(self, fx, fy, cx, cy):
        self.fx = fx
        self.fy = fy
        self.cx = cx
        self.cy = cy

    def tree_flatten(self):
        return (self.fx, self.fy, self.cx, self.cy), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def from_array(cls, k: jnp.ndarray) -> "Intrinsics":
        """From a (..., 4) array ordered [fx, fy, cx, cy] (the reference
        placeholder layout, legacy/ba.py:449 / seq_example.py:114)."""
        return cls(k[..., 0], k[..., 1], k[..., 2], k[..., 3])

    def as_array(self) -> jnp.ndarray:
        return jnp.stack([self.fx, self.fy, self.cx, self.cy], axis=-1)

    def scale(self, factor: float) -> "Intrinsics":
        """Intrinsics of the same camera at ``factor`` x resolution
        (reference bundlenet.py:311-315: fx/scale per pyramid level)."""
        return Intrinsics(self.fx * factor, self.fy * factor,
                          self.cx * factor, self.cy * factor)

    def __repr__(self):
        return f"Intrinsics(fx={self.fx}, fy={self.fy}, cx={self.cx}, cy={self.cy})"


def backproject(points2d: jnp.ndarray, intr: Intrinsics,
                normalized: bool = True) -> jnp.ndarray:
    """Pixel coordinates -> 3D rays.

    points2d: (..., N, 2) pixel (x, y).  Returns (..., N, 3) rays
    ((u-cx)/fx, (v-cy)/fy, 1), l2-normalized when ``normalized``
    (reference bundlenet.py:119) else left with z=1 (legacy/ba.py:27-34).
    With normalized rays, "depth" means distance along the ray; with z=1
    rays it is plain z-depth.
    """
    x = (points2d[..., 0] - intr.cx[..., None]) / intr.fx[..., None]
    y = (points2d[..., 1] - intr.cy[..., None]) / intr.fy[..., None]
    p = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    if normalized:
        p = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
    return p


_MIN_ABS_Z = 1e-6


def project(X: jnp.ndarray, intr: Intrinsics) -> Tuple[jnp.ndarray, ...]:
    """Camera-frame points -> pixels.

    X: (..., N, 3).  Returns (px, py, x, y, z) where (x, y) = (X/Z, Y/Z)
    are the normalized image coordinates the Jacobians need (reference
    bundlenet.py:140-148).  Z is clamped away from 0 so that degenerate
    points (behind/at the camera, possible with untrained depth nets)
    produce large-but-finite coordinates that the in-bounds mask then
    rejects, instead of NaNs that would poison the normal equations —
    the reference divides unguarded (bundlenet.py:144) and relies on
    trained weights never hitting this.
    """
    z_raw = X[..., 2]
    z = jnp.where(z_raw >= 0, jnp.maximum(z_raw, _MIN_ABS_Z),
                  jnp.minimum(z_raw, -_MIN_ABS_Z))
    x = X[..., 0] / z
    y = X[..., 1] / z
    px = intr.fx[..., None] * x + intr.cx[..., None]
    py = intr.fy[..., None] * y + intr.cy[..., None]
    return px, py, x, y, z


def warp_points(rays: jnp.ndarray, depth: jnp.ndarray, R: jnp.ndarray,
                t: jnp.ndarray, intr: Intrinsics):
    """Warp reference-frame rays into the target view.

    rays: (..., N, 3); depth: (..., N); R: (..., 3, 3); t: (..., 3).
    Computes X = (R rays) * depth + t then projects (reference
    bundlenet.py:136-148: Rp, RP, RPT then px, py).  Returns
    (px, py, x, y, z, Rp) with Rp the rotated rays, needed by the depth
    Jacobian (reference bundlenet.py:210,260).
    """
    Rp = jnp.einsum("...ij,...nj->...ni", R, rays)
    X = Rp * depth[..., None] + t[..., None, :]
    px, py, x, y, z = project(X, intr)
    return px, py, x, y, z, Rp


def crop_remap(points: jnp.ndarray, src_size: Tuple[int, int],
               dst_size: Tuple[int, int], border: int) -> jnp.ndarray:
    """Map points from a border-trimmed source image onto a resized grid.

    Generalizes reference bundlenet.py:286-288 / :337-340:
      x' = W_dst (x - b) / (W_src - 2 b),  same for y.
    The reference operating point is src (240, 320) -> dst (256, 320)
    with b = 4, giving exactly x' = 320 (x-4)/312 and y' = 256 (y-4)/232
    (note 232 = 240 - 8: the reference's vertical source is 240 rows).
    """
    (Hs, Ws), (Hd, Wd) = src_size, dst_size
    x = Wd * (points[..., 0] - border) / (Ws - 2 * border)
    y = Hd * (points[..., 1] - border) / (Hs - 2 * border)
    return jnp.stack([x, y], axis=-1)


def crop_adjusted_intrinsics(intr: Intrinsics, src_size: Tuple[int, int],
                             dst_size: Tuple[int, int],
                             border: int) -> Intrinsics:
    """Intrinsics after the same crop-to-grid remap as ``crop_remap``.

    Generalizes reference bundlenet.py:298-302:
      fx' = fx * W_dst/(W_src - 2b),
      cx' = cx * W_dst/(W_src - 2b) - W_dst * b/(W_src - 2b)
    (reference point: 40/39 and 160/39 horizontally, 32/29 and 128/29
    vertically).
    """
    (Hs, Ws), (Hd, Wd) = src_size, dst_size
    sx = Wd / (Ws - 2 * border)
    sy = Hd / (Hs - 2 * border)
    return Intrinsics(intr.fx * sx, intr.fy * sy,
                      intr.cx * sx - border * sx,
                      intr.cy * sy - border * sy)
