"""Depth-map evaluation: the BA-Net paper's second headline metric.

The reference repo evaluates only pose/trajectory (legacy/eval.py:234,
vendored rgbd_benchmark) — but the BA-Net paper (arXiv 1806.04807,
PAPERS.md) reports DEPTH accuracy of the bundle-adjusted output
(init_depth + basis @ W, reference bundlenet.py:397) alongside
trajectory error.  This module provides the standard Eigen depth-metric
set and a pair-wise driver over the flagship's ``bundle_adjust`` so a
trained model's refined depth can be scored against sensor/GT depth:

  abs_rel   mean(|d - d*| / d*)
  sq_rel    mean((d - d*)^2 / d*)
  rmse      sqrt(mean((d - d*)^2))
  rmse_log  sqrt(mean((log d - log d*)^2))
  a1/a2/a3  fraction with max(d/d*, d*/d) < 1.25 / 1.25^2 / 1.25^3

Each metric is reported raw (the network's metric scale — BA against a
calibrated camera observes absolute translation, so scale is
meaningful) and median-scaled (d * median(d*)/median(d), the standard
monocular protocol) so the scale and shape errors are separable.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional

import numpy as np


def depth_metrics(pred: np.ndarray, gt: np.ndarray,
                  valid: Optional[np.ndarray] = None,
                  min_depth: float = 1e-3,
                  max_depth: float = 80.0) -> Dict[str, float]:
    """Eigen metric set over valid pixels (gt > 0 within range)."""
    pred = np.asarray(pred, np.float64).reshape(-1)
    gt = np.asarray(gt, np.float64).reshape(-1)
    mask = (gt > min_depth) & (gt < max_depth) & np.isfinite(pred)
    if valid is not None:
        mask &= np.asarray(valid).reshape(-1).astype(bool)
    if not mask.any():
        return {"valid_fraction": 0.0}
    p = np.clip(pred[mask], min_depth, max_depth)
    g = gt[mask]

    def eigen(p):
        thresh = np.maximum(p / g, g / p)
        return {
            "abs_rel": float(np.mean(np.abs(p - g) / g)),
            "sq_rel": float(np.mean((p - g) ** 2 / g)),
            "rmse": float(np.sqrt(np.mean((p - g) ** 2))),
            "rmse_log": float(np.sqrt(np.mean(
                (np.log(p) - np.log(g)) ** 2))),
            "a1": float(np.mean(thresh < 1.25)),
            "a2": float(np.mean(thresh < 1.25 ** 2)),
            "a3": float(np.mean(thresh < 1.25 ** 3)),
        }

    out = eigen(p)
    scale = float(np.median(g) / max(np.median(p), 1e-9))
    out.update({f"scaled_{k}": v
                for k, v in eigen(np.clip(p * scale, min_depth,
                                          max_depth)).items()})
    out["median_scale"] = scale
    out["valid_fraction"] = float(mask.mean())
    return out


def evaluate_depth_pairs(tracker, pairs: Iterable[dict],
                         intrinsics: np.ndarray,
                         num_points: int = 1024,
                         rng: Optional[np.random.Generator] = None,
                         max_depth: float = 80.0
                         ) -> List[Dict[str, float]]:
    """Score ``bundle_adjust``'s initial and refined depth maps.

    ``pairs``: dicts with image1, image2 (H, W, 3), depth1 (H, W, GT
    for the reference frame), R_gt/t_gt optional (ignored; BA runs from
    identity like the reference's BundleResize, bundlenet.py:332-399).
    The depth/basis maps live at 1/2 resolution, so GT is 2x2
    box-downsampled (mean of valid sensor pixels) before scoring.
    Returns one dict per pair: init_* and refined_* metric sets.
    """
    rng = rng or np.random.default_rng(0)
    results = []
    for p in pairs:
        H, W = p["image1"].shape[:2]
        pts = np.stack([
            rng.uniform(8.0, W - 8.0, (1, num_points)),
            rng.uniform(8.0, H - 8.0, (1, num_points))], axis=-1)
        init, refined = tracker.bundle_depth(
            p["image1"], p["image2"], intrinsics,
            pts.astype(np.float32))
        gt = np.asarray(p["depth1"], np.float64)
        gt = gt[:(H // 2) * 2, :(W // 2) * 2].reshape(
            H // 2, 2, W // 2, 2)
        cnt = (gt > 0).sum(axis=(1, 3))
        gt_half = np.where(cnt > 0,
                           gt.sum(axis=(1, 3)) / np.maximum(cnt, 1), 0.0)
        rec = {}
        for name, pred in (("init", init[0]), ("refined", refined[0])):
            m = depth_metrics(pred, gt_half, max_depth=max_depth)
            rec.update({f"{name}_{k}": v for k, v in m.items()})
        results.append(rec)
    return results


def evaluate_depth_windows(tracker, windows: Iterable[dict],
                           intrinsics: np.ndarray,
                           num_points: int = 1024,
                           num_iters: int = 5,
                           rng: Optional[np.random.Generator] = None,
                           max_depth: float = 80.0
                           ) -> List[Dict[str, float]]:
    """Score the MULTI-FRAME window BA's initial and refined depth maps
    (tracker.window_depth): real baselines across F frames make the
    scale observable, unlike the near-degenerate small-baseline pair
    (VERDICT r3 item 7 — the paper's joint-BA-improves-depth claim is a
    window claim).

    ``windows``: dicts with image_key (H, W, 3), images_tgt (F, H, W,
    3), depth_key (H, W GT for the keyframe)."""
    rng = rng or np.random.default_rng(0)
    results = []
    for w in windows:
        H, W = w["image_key"].shape[:2]
        pts = np.stack([
            rng.uniform(8.0, W - 8.0, (1, num_points)),
            rng.uniform(8.0, H - 8.0, (1, num_points))], axis=-1)
        init, refined = tracker.window_depth(
            w["image_key"], w["images_tgt"], intrinsics,
            pts.astype(np.float32), num_iters=num_iters)
        gt = np.asarray(w["depth_key"], np.float64)
        gt = gt[:(H // 2) * 2, :(W // 2) * 2].reshape(
            H // 2, 2, W // 2, 2)
        cnt = (gt > 0).sum(axis=(1, 3))
        gt_half = np.where(cnt > 0,
                           gt.sum(axis=(1, 3)) / np.maximum(cnt, 1), 0.0)
        rec = {}
        for name, pred in (("init", init), ("refined", refined)):
            m = depth_metrics(pred, gt_half, max_depth=max_depth)
            rec.update({f"{name}_{k}": v for k, v in m.items()})
        results.append(rec)
    return results


def summarize_depth(results: List[Dict[str, float]]) -> Dict[str, float]:
    out = {}
    if not results:
        return out
    for k in results[0]:
        vals = np.asarray([r[k] for r in results if k in r])
        out[f"{k}_mean"] = float(vals.mean())
    out["num_pairs"] = float(len(results))
    return out
