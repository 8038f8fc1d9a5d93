"""Two-view pair evaluation against ground-truth motion.

Equivalent of the reference pair evaluator (legacy/eval.py:150-236):
for each (reference, target) pair with known GT relative motion,

  1. select covisible points using the GT warp (photo + depth
     consistency gates; data/points.select_covisible_points ==
     valid_point_and_depth2, legacy/eval.py:102-147);
  2. track with the two-view tracker, warm-starting through the chain;
  3. report the quaternion angle error and translation L2 error, each
     alongside the predicted magnitude for scale sanity — the exact
     quantities of the reference printout (legacy/eval.py:234).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from banet_tpu.eval.trajectory import _rot_to_quat


def pair_errors(R_pred: np.ndarray, t_pred: np.ndarray,
                R_gt: np.ndarray, t_gt: np.ndarray) -> Dict[str, float]:
    """The legacy/eval.py:234 error set (angles in degrees)."""
    qp = _rot_to_quat(np.asarray(R_pred).reshape(3, 3))  # xyzw, w>=0
    qg = _rot_to_quat(np.asarray(R_gt).reshape(3, 3))
    dot = float(np.clip(np.abs(np.dot(qp, qg)), -1.0, 1.0))
    rot_err_deg = 2.0 * np.degrees(np.arccos(dot))
    pred_mag_deg = 2.0 * np.degrees(np.arccos(np.clip(qp[3], -1.0, 1.0)))
    t_pred = np.asarray(t_pred).reshape(3)
    t_gt = np.asarray(t_gt).reshape(3)
    return {
        "rotation_error_deg": float(rot_err_deg),
        "predicted_rotation_deg": float(pred_mag_deg),
        "translation_error_m": float(np.linalg.norm(t_gt - t_pred)),
        "predicted_translation_m": float(np.linalg.norm(t_pred)),
    }


def evaluate_pairs(tracker, pairs, intrinsics: np.ndarray,
                   num_points: int = 4096,
                   rng: Optional[np.random.Generator] = None,
                   viz_dir: Optional[str] = None
                   ) -> List[Dict[str, float]]:
    """Run the tracker over GT-annotated pairs.

    ``pairs``: iterable of dicts with keys image1, image2 (H, W, 3),
    depth1, depth2 (H, W), R_gt (3, 3), t_gt (3,).  Returns per-pair
    error dicts (pair_errors keys + keep_ratio).  With ``viz_dir``,
    saves a correspondence panel (points joined to their predicted-pose
    warp) and a warp-diff panel per pair (reference
    legacy/eval.py:78-100 / deeptam example_basic.py:23-59 visuals).
    """
    from banet_tpu.data.points import select_covisible_points

    rng = rng or np.random.default_rng(0)
    if viz_dir:
        import os

        os.makedirs(viz_dir, exist_ok=True)
    results = []
    for idx, p in enumerate(pairs):
        pts, depths = select_covisible_points(
            p["image1"], p["image2"], p["depth1"], p["depth2"],
            p["R_gt"], p["t_gt"], intrinsics, num_points, rng=rng)
        R, t, keep = tracker.track(p["image1"], p["image2"], intrinsics,
                                   pts, depths)
        res = pair_errors(R[0], t[0], p["R_gt"], p["t_gt"])
        res["keep_ratio"] = float(keep[0])
        results.append(res)
        if viz_dir:
            import os

            import jax.numpy as jnp

            from banet_tpu.geometry.camera import (Intrinsics,
                                                   backproject,
                                                   warp_points)
            from banet_tpu.utils.viz import (draw_correspondences,
                                             save_png, warp_diff_panel)

            k = np.asarray(intrinsics, np.float32).reshape(-1)
            intr = Intrinsics(jnp.array([k[0]]), jnp.array([k[1]]),
                              jnp.array([k[2]]), jnp.array([k[3]]))
            rays = backproject(jnp.asarray(pts), intr, normalized=False)
            px, py, *_ = warp_points(
                rays, jnp.asarray(depths)[..., 0], jnp.asarray(R),
                jnp.asarray(t), intr)
            H, W = p["image1"].shape[:2]
            inb = ((np.asarray(px[0]) >= 0) & (np.asarray(px[0]) <= W - 1)
                   & (np.asarray(py[0]) >= 0) &
                   (np.asarray(py[0]) <= H - 1))
            panel = draw_correspondences(
                p["image1"], p["image2"], pts[0],
                np.stack([np.asarray(px[0]), np.asarray(py[0])], -1),
                inb)
            save_png(os.path.join(viz_dir, f"pair_{idx:04d}_corr.png"),
                     panel)
            save_png(os.path.join(viz_dir, f"pair_{idx:04d}_warp.png"),
                     warp_diff_panel(p["image1"], p["image2"],
                                     p["depth1"], R[0], t[0], k))
    return results


def summarize(results: List[Dict[str, float]]) -> Dict[str, float]:
    out = {}
    if not results:
        return out
    for k in results[0]:
        vals = np.asarray([r[k] for r in results])
        out[f"{k}_mean"] = float(vals.mean())
        out[f"{k}_median"] = float(np.median(vals))
    out["num_pairs"] = float(len(results))
    return out
