"""Training losses.

Equivalents of the reference loss set (reference bundlenet.py:401-463)
plus a depth-supervision term (the reference repo ships no training
script; the depth term follows the paper's recipe of supervising the
initial depth prediction):

- ``loss_rotation``: quaternion cosine distance (bundlenet.py:401-404),
  made sign-robust via |dot| (both q and -q encode the same rotation);
- ``loss_translation``: mean absolute error — the surviving of the two
  duplicate ``lossT`` definitions (bundlenet.py:411-413 shadows the
  angular one at :406-409, which is kept here under its own name);
- ``loss_flow``: masked flow-consistency — project every pixel through
  (GT depth, pred pose) vs (GT depth, GT pose) and penalize the mean
  absolute flow difference, renormalized by the valid-pixel count and
  the image width (bundlenet.py:415-463, including its quirk of
  dividing BOTH components by width, :462-463);
- ``loss_depth_l1``: masked mean |log ratio| depth error (new).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from banet_tpu.geometry.camera import Intrinsics, backproject, warp_points
from banet_tpu.geometry.se3 import rotation_to_quaternion


def loss_rotation(R_pred: jnp.ndarray, R_gt: jnp.ndarray) -> jnp.ndarray:
    """1 - |<q_pred, q_gt>| averaged over the batch."""
    qp = rotation_to_quaternion(R_pred)
    qg = rotation_to_quaternion(R_gt)
    dot = jnp.abs(jnp.sum(qp * qg, axis=-1))
    return jnp.mean(1.0 - jnp.clip(dot, 0.0, 1.0))


def loss_translation(t_pred: jnp.ndarray, t_gt: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute translation error (bundlenet.py:411-413)."""
    return jnp.mean(jnp.abs(t_pred - t_gt))


def loss_translation_angular(t_pred: jnp.ndarray,
                             t_gt: jnp.ndarray) -> jnp.ndarray:
    """Cosine distance between translation directions (the shadowed
    lossT at bundlenet.py:406-409)."""
    eps = 1e-8
    p = t_pred / (jnp.linalg.norm(t_pred, axis=-1, keepdims=True) + eps)
    g = t_gt / (jnp.linalg.norm(t_gt, axis=-1, keepdims=True) + eps)
    return jnp.mean(1.0 - jnp.sum(p * g, axis=-1))


def _dense_flow(depth: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray,
                intr: Intrinsics, normalized_rays: bool):
    """Project every pixel of a (B, H, W) depth map through (R, t)."""
    B, H, W = depth.shape
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    grid = jnp.stack([xx.ravel(), yy.ravel()], axis=-1)[None]
    grid = jnp.broadcast_to(grid, (B, H * W, 2))
    rays = backproject(grid, intr, normalized=normalized_rays)
    px, py, *_ = warp_points(rays, depth.reshape(B, -1), R, t, intr)
    return px, py


def loss_flow(intr: Intrinsics, depth: jnp.ndarray, mask: jnp.ndarray,
              R_pred: jnp.ndarray, t_pred: jnp.ndarray,
              R_gt: jnp.ndarray, t_gt: jnp.ndarray,
              normalized_rays: bool = True) -> jnp.ndarray:
    """Flow-consistency loss (bundlenet.py:415-463).

    depth: (B, H, W) GT depth; mask: (B, H, W) validity.  The same GT
    depth drives both projections, so only the pose difference is
    penalized, in units of image widths.
    """
    B, H, W = depth.shape
    m = mask.reshape(B, -1)
    px_p, py_p = _dense_flow(depth, R_pred, t_pred, intr, normalized_rays)
    px_g, py_g = _dense_flow(depth, R_gt, t_gt, intr, normalized_rays)
    valid = jnp.sum(m)
    total = float(H * W) * B
    scale = total / jnp.maximum(valid, 1.0)
    # The reference divides both flow components by width (its quirk,
    # bundlenet.py:462-463) — kept for parity.
    fx_err = jnp.mean(jnp.abs(px_p - px_g) * m) / W
    fy_err = jnp.mean(jnp.abs(py_p - py_g) * m) / W
    return scale * (fx_err + fy_err)


def loss_depth_l1(depth_pred: jnp.ndarray, depth_gt: jnp.ndarray,
                  mask: Optional[jnp.ndarray] = None,
                  log_space: bool = True) -> jnp.ndarray:
    """Masked L1 depth supervision, optionally on log depth.

    NaN-hardened: the refined depth comes through the (6+K) bundle
    solve, which CAN emit non-finite values on degenerate batches (a
    low-texture domain-randomized crop can make the basis block
    numerically singular — observed poisoning campaign_r7's depth term
    from step 7400).  A non-finite prediction pixel must not poison
    the batch loss, and — the classic autodiff pitfall — sanitizing
    must happen BEFORE the log/max chain: ``0 * d(log(max(NaN)))`` is
    NaN in the VJP even under a zero mask, so the pixel is replaced
    (not just masked) and excluded from the mask (same guard pattern
    as ops/solve.py)."""
    finite = jnp.isfinite(depth_pred)
    pred = jnp.where(finite, depth_pred, 1.0)
    if log_space:
        eps = 1e-3
        err = jnp.abs(jnp.log(jnp.maximum(pred, eps)) -
                      jnp.log(jnp.maximum(depth_gt, eps)))
    else:
        err = jnp.abs(pred - depth_gt)
    m = finite.astype(err.dtype)
    if mask is not None:
        m = m * mask.astype(err.dtype)
    return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)


def window_loss(win_out: Dict, Rs_gt: jnp.ndarray, ts_gt: jnp.ndarray,
                depth_gt: Optional[jnp.ndarray] = None
                ) -> Dict[str, jnp.ndarray]:
    """Supervision for ``BANet.window_bundle_adjust`` output (round-5:
    the joint multi-frame solve is otherwise never trained — its
    learned damping sees a distribution it was never fit on and the
    window refinement delivers noise-level gains; VERDICT r4 item 3c).

    win_out: dict with Rs (F, 3, 3), ts (F, 3), refined_depth_map
    (H/2, W/2); Rs_gt/ts_gt (F, ...) cam-from-keyframe GT; depth_gt
    optional (H, W) keyframe GT depth (strided to the head's half
    resolution here)."""
    terms = {"win_rotation": loss_rotation(win_out["Rs"], Rs_gt),
             "win_translation": loss_translation(win_out["ts"], ts_gt)}
    if depth_gt is not None:
        dg = depth_gt[::2, ::2]
        terms["win_depth"] = loss_depth_l1(
            win_out["refined_depth_map"][None], dg[None],
            (dg > 0)[None].astype(jnp.float32))
    return terms


def total_loss(outputs: Dict, batch: Dict, intr: Intrinsics, weights,
               normalized_rays: bool = True) -> Dict[str, jnp.ndarray]:
    """Combine the loss terms over all emitted solver levels (the
    reference supervises every level's output, bundlenet.py:395-397).

    outputs: dict from BANet.bundle_adjust (per_level list of (R, t, W),
    refined/init depth maps).  batch needs R_gt, t_gt, depth_gt (B,H,W),
    valid_mask (B,H,W).
    """
    R_gt, t_gt = batch["R_gt"], batch["t_gt"]
    terms = {"rotation": 0.0, "translation": 0.0, "flow": 0.0}
    # Supervise EVERY solver level: the pose-track cascade's levels
    # (coarse -> fine, present when training through BANet.__call__)
    # followed by the bundle levels.  Without the pose-track terms the
    # coarse levels — the tracker's convergence basin — get no
    # supervision at all (measured: eval-from-identity stalls halfway
    # on motions the fine levels alone cannot capture).
    levels = ([(R, t) for (R, t) in outputs.get("pose_per_level", [])]
              + [(R, t) for (R, t, _W) in outputs["per_level"]])
    for (R, t) in levels:
        terms["rotation"] += loss_rotation(R, R_gt) / len(levels)
        terms["translation"] += loss_translation(t, t_gt) / len(levels)
        terms["flow"] += loss_flow(
            intr, batch["depth_gt"], batch["valid_mask"], R, t, R_gt, t_gt,
            normalized_rays) / len(levels)
    # Depth supervision at 1/2 resolution (the depth head's native res).
    dg = batch["depth_gt"][:, ::2, ::2]
    vm = batch["valid_mask"][:, ::2, ::2]
    terms["depth"] = loss_depth_l1(
        outputs["refined_depth_map"][..., 0], dg, vm)
    terms["depth"] += loss_depth_l1(outputs["init_depth_map"][..., 0],
                                    dg, vm)
    total = (weights.loss_rotation_weight * terms["rotation"] +
             weights.loss_translation_weight * terms["translation"] +
             weights.loss_flow_weight * terms["flow"] +
             weights.loss_depth_weight * terms["depth"])
    terms["total"] = total
    return terms
