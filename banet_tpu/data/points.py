"""Texture-based point selection for tracking.

Equivalent of reference ``valid_point_and_depth``
(legacy/seq_example.py:72-82 / legacy/example.py:71-81): keep pixels
whose Sobel gradient magnitude exceeds a threshold AND whose depth is
valid, then draw N points uniformly (with replacement, like the
reference's ``np.random.randint``).  Host-side numpy — point selection
happens once per keyframe, not in the jitted hot path.

The GT-guided covisibility selector of the pair evaluator
(legacy/eval.py:102-147) is also provided: it additionally gates on
photo-consistency and depth-consistency after warping through the
ground-truth motion.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)


def sobel_magnitude(image: np.ndarray) -> np.ndarray:
    """(H, W, C) or (H, W) -> (H, W) combined Sobel |gradient|.

    Note the reference computes dx with the x-kernel twice
    (legacy/seq_example.py:73-74 passes (1, 0) for both "dx" and "dy" —
    a bug per SURVEY.md §7 spirit); we use the correct x/y pair.
    """
    img = image.astype(np.float32)
    if img.ndim == 2:
        img = img[..., None]
    H, W, C = img.shape
    pad = np.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    gx = np.zeros((H, W, C), np.float32)
    gy = np.zeros((H, W, C), np.float32)
    for dy in range(3):
        for dx in range(3):
            wx = _SOBEL_X[dy, dx]
            wy = _SOBEL_X[dx, dy]
            if wx or wy:
                patch = pad[dy:dy + H, dx:dx + W]
                gx += wx * patch
                gy += wy * patch
    return np.sqrt((gx ** 2).sum(-1) + (gy ** 2).sum(-1))


def select_points(image: np.ndarray, depth: np.ndarray, num_points: int,
                  texture_threshold: float = 120.0,
                  min_depth: float = 1e-5,
                  rng: Optional[np.random.Generator] = None
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Pick textured, depth-valid pixels.

    Returns (points (1, N, 2) float32 [x, y], depths (1, N, 1) float32).
    Falls back to relaxing the texture gate if too few pixels qualify.
    """
    rng = rng or np.random.default_rng(0)
    H, W = depth.shape[:2]
    mag = sobel_magnitude(image)
    d = depth.reshape(-1)
    m = mag.reshape(-1)
    thr = texture_threshold
    idx = np.flatnonzero((m > thr) & (d > min_depth))
    while idx.size < max(num_points // 8, 16) and thr > 1e-3:
        thr *= 0.5
        idx = np.flatnonzero((m > thr) & (d > min_depth))
    if idx.size == 0:
        idx = np.flatnonzero(d > min_depth)
    if idx.size == 0:
        raise ValueError("no depth-valid pixels to select points from")
    pick = idx[rng.integers(0, idx.size, num_points)]
    ys, xs = np.divmod(pick, W)
    pts = np.stack([xs, ys], axis=-1).astype(np.float32)
    return pts[None], d[pick].astype(np.float32)[None, :, None]


def select_textured_points(image: np.ndarray, num_points: int,
                           texture_threshold: float = 120.0,
                           rng: Optional[np.random.Generator] = None
                           ) -> np.ndarray:
    """Texture-only selection (monocular mode — no sensor depth gate).

    Returns points (1, N, 2) float32; depth comes from the network's
    depth/basis prediction downstream (BANet.bundle_adjust)."""
    rng = rng or np.random.default_rng(0)
    H = image.shape[0]
    W = image.shape[1]
    mag = sobel_magnitude(image).reshape(-1)
    thr = texture_threshold
    idx = np.flatnonzero(mag > thr)
    while idx.size < max(num_points // 8, 16) and thr > 1e-3:
        thr *= 0.5
        idx = np.flatnonzero(mag > thr)
    if idx.size == 0:
        idx = np.arange(H * W)
    pick = idx[rng.integers(0, idx.size, num_points)]
    ys, xs = np.divmod(pick, W)
    return np.stack([xs, ys], axis=-1).astype(np.float32)[None]


def select_covisible_points(image1: np.ndarray, image2: np.ndarray,
                            depth1: np.ndarray, depth2: np.ndarray,
                            R: np.ndarray, t: np.ndarray,
                            intrinsics: np.ndarray, num_points: int,
                            texture_threshold: float = 80.0,
                            color_threshold: float = 64.0,
                            depth_ratio_threshold: float = 0.2,
                            rng: Optional[np.random.Generator] = None
                            ) -> Tuple[np.ndarray, np.ndarray]:
    """GT-guided covisible point selection (legacy/eval.py:102-147):
    textured + depth-valid pixels whose GT warp lands in-bounds, photo-
    consistent (color distance < 64) and depth-consistent (relative
    error < 0.2).  intrinsics: [fx, fy, cx, cy].  Vectorized numpy.
    """
    rng = rng or np.random.default_rng(0)
    fx, fy, cx, cy = [float(v) for v in np.asarray(intrinsics).reshape(-1)]
    H, W = depth1.shape[:2]
    mag = sobel_magnitude(image1)
    ys, xs = np.mgrid[0:H, 0:W]
    valid = (depth1 > 1e-5) & (mag > texture_threshold)

    px = (xs - cx) / fx
    py = (ys - cy) / fy
    P = np.stack([px, py, np.ones_like(px)], axis=-1) * depth1[..., None]
    Pw = P @ R.T + t.reshape(1, 1, 3)
    z = Pw[..., 2]
    with np.errstate(divide="ignore", invalid="ignore"):
        u = (Pw[..., 0] / z) * fx + cx
        v = (Pw[..., 1] / z) * fy + cy
    ui = np.round(u).astype(np.int64)
    vi = np.round(v).astype(np.int64)
    inb = (z > 1e-6) & (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
    uis = np.clip(ui, 0, W - 1)
    vis = np.clip(vi, 0, H - 1)
    color_d = np.linalg.norm(
        image1.astype(np.float32) -
        image2[vis, uis].astype(np.float32), axis=-1)
    d2 = depth2[vis, uis]
    with np.errstate(divide="ignore", invalid="ignore"):
        depth_rel = np.abs(z - d2) / np.where(z == 0, 1.0, z)
    good = (valid & inb & (color_d < color_threshold) &
            (depth_rel < depth_ratio_threshold))
    idx = np.flatnonzero(good.reshape(-1))
    if idx.size == 0:
        return select_points(image1, depth1, num_points,
                             texture_threshold, rng=rng)
    pick = idx[rng.integers(0, idx.size, num_points)]
    yy, xx = np.divmod(pick, W)
    pts = np.stack([xx, yy], axis=-1).astype(np.float32)
    return pts[None], depth1.reshape(-1)[pick].astype(
        np.float32)[None, :, None]
