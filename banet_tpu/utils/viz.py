"""Visual diagnostics: correspondence drawing and warp-difference maps.

Equivalents of the reference's debugging visuals — correspondence
lines between a pair (reference legacy/eval.py:78-100 ``draw_match``)
and warped-vs-real image diffs (reference deeptam
examples/example_basic.py:23-59) — so a mistracking model can be
debugged by looking at images instead of scalars.  Pure numpy + PIL
(host-side; nothing here runs in the jitted path).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _to_uint8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    return img


def draw_correspondences(image1: np.ndarray, image2: np.ndarray,
                         pts1: np.ndarray, pts2: np.ndarray,
                         mask: Optional[np.ndarray] = None,
                         max_lines: int = 64) -> np.ndarray:
    """Side-by-side pair with lines joining corresponding points.

    image1/image2: (H, W, 3) in [0, 255]; pts1/pts2: (N, 2) [x, y]
    pixel coords in their own images; mask: optional (N,) validity
    (invalid pairs drawn red, valid green).  Returns (H, 2W, 3) uint8
    (reference legacy/eval.py:78-100 semantics).
    """
    from PIL import Image, ImageDraw

    a = _to_uint8(image1)
    b = _to_uint8(image2)
    H, W = a.shape[:2]
    canvas = np.concatenate([a, b], axis=1)
    im = Image.fromarray(canvas)
    draw = ImageDraw.Draw(im)
    pts1 = np.asarray(pts1, np.float64).reshape(-1, 2)
    pts2 = np.asarray(pts2, np.float64).reshape(-1, 2)
    n = len(pts1)
    step = max(1, n // max_lines)
    for i in range(0, n, step):
        ok = True if mask is None else bool(np.asarray(mask).ravel()[i])
        color = (0, 255, 0) if ok else (255, 0, 0)
        x1, y1 = pts1[i]
        x2, y2 = pts2[i]
        draw.line([(x1, y1), (x2 + W, y2)], fill=color, width=1)
        draw.ellipse([x1 - 1, y1 - 1, x1 + 1, y1 + 1], fill=color)
        draw.ellipse([x2 + W - 1, y2 - 1, x2 + W + 1, y2 + 1],
                     fill=color)
    return np.asarray(im)


def warp_image(image2: np.ndarray, depth1: np.ndarray, R: np.ndarray,
               t: np.ndarray, intrinsics) -> Tuple[np.ndarray,
                                                   np.ndarray]:
    """Render image2 into view 1 through depth1 and the relative pose.

    intrinsics: [fx, fy, cx, cy] or geometry Intrinsics.  Returns
    (warped (H, W, 3) float, valid (H, W) bool)."""
    import jax.numpy as jnp

    from banet_tpu.geometry.camera import (Intrinsics, backproject,
                                           warp_points)
    from banet_tpu.ops.resample import bilinear_sample

    if not isinstance(intrinsics, Intrinsics):
        k = np.asarray(intrinsics, np.float32).reshape(-1)
        intrinsics = Intrinsics(jnp.array([k[0]]), jnp.array([k[1]]),
                                jnp.array([k[2]]), jnp.array([k[3]]))
    H, W = np.asarray(depth1).shape[:2]
    yy, xx = np.meshgrid(np.arange(H, dtype=np.float32),
                         np.arange(W, dtype=np.float32), indexing="ij")
    grid = jnp.asarray(np.stack([xx.ravel(), yy.ravel()], axis=-1))[None]
    rays = backproject(grid, intrinsics, normalized=False)
    d = jnp.asarray(np.asarray(depth1, np.float32).ravel())[None]
    px, py, *_ = warp_points(rays, d, jnp.asarray(R)[None],
                             jnp.asarray(t).reshape(1, 3), intrinsics)
    sampled = bilinear_sample(jnp.asarray(
        np.asarray(image2, np.float32))[None], px, py)[0]
    warped = np.asarray(sampled).reshape(H, W, -1)
    valid = ((np.asarray(px[0]) >= 0) & (np.asarray(px[0]) <= W - 1) &
             (np.asarray(py[0]) >= 0) & (np.asarray(py[0]) <= H - 1) &
             (np.asarray(depth1).ravel() > 0)).reshape(H, W)
    return warped, valid


def warp_diff_panel(image1: np.ndarray, image2: np.ndarray,
                    depth1: np.ndarray, R: np.ndarray, t: np.ndarray,
                    intrinsics) -> np.ndarray:
    """[image1 | image2 warped into view 1 | abs diff] panel (H, 3W, 3)
    uint8 — the reference's warped-vs-real debugging figure
    (deeptam examples/example_basic.py:23-59).  A good pose makes the
    middle panel look like the left one and the right panel dark."""
    warped, valid = warp_image(image2, depth1, R, t, intrinsics)
    a = np.asarray(image1, np.float32)
    diff = np.abs(a - warped) * valid[..., None]
    return np.concatenate([_to_uint8(a), _to_uint8(warped),
                           _to_uint8(diff)], axis=1)


def save_png(path: str, array: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(_to_uint8(array)).save(path)
