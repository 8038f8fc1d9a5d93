"""Joint pose + depth-basis bundle adjustment (the BA-Net layer).

Equivalent of reference ``BundleIteration`` / ``BundleResize``
(bundlenet.py:193-278, :332-399): per-point depth is parameterized as

    D_n(W) = d_n + b_n . W

with d the network's initial depth, b_n the K-channel depth basis
sampled at point n, and W in R^K the only depth unknowns (the "compact
depth parameterization" that makes dense BA tractable — SURVEY.md §5
"long-context").  One GN step solves the (6+K) x (6+K) damped system
for [pose | W] jointly; the Jacobian concatenates

    J_cam (N, 2, 6)   and   J_depth (N, 2, 1) * b_n (1, K)

exactly as reference bundlenet.py:259-261.  The bundle damping scales
by ``bundle_damping_base`` (1000, bundlenet.py:393) and — reference
quirk kept behind a config flag — leaves the last diagonal entry
undamped (bundlenet.py:266).

Differentiability: gradients flow through the warp, the sampler, the
normal-equation einsums, and the solve into the encoder/decoder weights;
this is the end-to-end-trainable property the reference achieved with a
hand-written CUDA VJP (SURVEY.md §3.2).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from banet_tpu.ba.camera_solver import DampingFn
from banet_tpu.ba.residuals import warp_residuals
from banet_tpu.config import SolverConfig
from banet_tpu.geometry.camera import Intrinsics
from banet_tpu.geometry.jacobians import camera_jacobian, depth_jacobian
from banet_tpu.geometry.se3 import se3_update
from banet_tpu.ops.normal_eq import build_normal_equations
from banet_tpu.ops.solve import damped_solve


class BundleStepAux(NamedTuple):
    residual_before: jnp.ndarray  # (B,)
    keep_ratio: jnp.ndarray       # (B,)
    lam: jnp.ndarray              # (B,)


def bundle_gn_step(
        ref_feats: jnp.ndarray, tgt_feats_grad: jnp.ndarray,
        rays: jnp.ndarray, init_depth: jnp.ndarray, basis: jnp.ndarray,
        R: jnp.ndarray, t: jnp.ndarray, W: jnp.ndarray,
        intr: Intrinsics, damping_fn: DampingFn, cfg: SolverConfig,
        renormalize_residual: bool = False,
        footprint_hw=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, BundleStepAux]:
    """One damped GN step over (pose, basis coefficients).

    Shapes: ref_feats (B, N, C); tgt_feats_grad (B, H, W, 3C) — or a
    footprint map with ``footprint_hw=(H, W)``; rays (B, N, 3);
    init_depth (B, N); basis (B, N, K); R (B, 3, 3); t (B, 3); W (B, K).
    Returns updated (R, t, W).
    """
    depth = init_depth + jnp.einsum("bnk,bk->bn", basis, W)
    wr = warp_residuals(ref_feats, tgt_feats_grad, rays, depth, R, t,
                        intr, footprint=footprint_hw)
    avg_r = wr.avg_abs_residual(renormalize_residual)
    lam = damping_fn(avg_r) * cfg.bundle_damping_base

    J_cam = camera_jacobian(wr.x, wr.y, wr.z, intr.fx, intr.fy)
    J_d = depth_jacobian(wr.rotated_rays, wr.x, wr.y, wr.z,
                         intr.fx, intr.fy)  # (B, N, 2)
    # Outer product with the per-point basis row (bundlenet.py:260).
    J_w = J_d[..., None] * basis[..., None, :]  # (B, N, 2, K)
    J = jnp.concatenate([J_cam, J_w], axis=-1)  # (B, N, 2, 6+K)

    AtA, Atb = build_normal_equations(J, wr.G, wr.residual)
    if cfg.bundle_w_prior_rel > 0.0:
        # Depth prior: anchor Delta-W to 0 (= trust the depth head)
        # with an ABSOLUTE Tikhonov term sized by the W block's mean
        # curvature; see SolverConfig.bundle_w_prior_rel.
        K = W.shape[-1]
        diag_w = jnp.diagonal(AtA, axis1=-2, axis2=-1)[..., 6:]
        mu = cfg.bundle_w_prior_rel * jnp.mean(diag_w, axis=-1)
        block = jnp.concatenate(
            [jnp.zeros((6,), AtA.dtype), jnp.ones((K,), AtA.dtype)])
        AtA = AtA + mu[:, None, None] * jnp.diag(block)
    delta = -damped_solve(AtA, Atb, lam, cfg.diag_floor,
                          damp_last=cfg.damp_last_diag)
    R_new, t_new = se3_update(R, t, delta[:, :6])
    W_new = W + delta[:, 6:]
    res_before = jnp.mean(avg_r, axis=-1)
    if cfg.bundle_reject_bad_steps:
        # Step rejection, as the pose path has (legacy/ba.py:304-345).
        # The reference's BundleIteration never checks its step — but a
        # two-view monocular (6+K) solve has a near-null scale-gauge
        # direction (translation magnitude vs. depth scale), and with
        # small residuals the relative LM damping leaves it effectively
        # unregularized: measured W steps of ~1e2 that drive the
        # refined depth negative on small-baseline pairs.  Re-warp at
        # the proposal and keep it only if the residual decreases.
        depth_new = init_depth + jnp.einsum("bnk,bk->bn", basis, W_new)
        wr_after = warp_residuals(ref_feats, tgt_feats_grad, rays,
                                  depth_new, R_new, t_new, intr,
                                  footprint=footprint_hw)
        # The accept test MUST renormalize by the valid-point count and
        # gate on keep_ratio: a depth step that throws points out of
        # bounds zeroes their residual contribution, so the plain mean
        # would reward ejecting the point set from the image.
        res_b = jnp.mean(wr.avg_abs_residual(True), axis=-1)
        res_a = jnp.mean(wr_after.avg_abs_residual(True), axis=-1)
        accept = ((res_a < cfg.residual_ratio * res_b) &
                  (wr_after.keep_ratio >= 0.8 * wr.keep_ratio))
        R_new = jnp.where(accept[:, None, None], R_new, R)
        t_new = jnp.where(accept[:, None], t_new, t)
        W_new = jnp.where(accept[:, None], W_new, W)
    aux = BundleStepAux(
        residual_before=res_before,
        keep_ratio=wr.keep_ratio,
        lam=lam,
    )
    return R_new, t_new, W_new, aux


def solve_bundle_pyramid(
        ref_feats_levels: Sequence[jnp.ndarray],
        tgt_feats_grad_levels: Sequence[jnp.ndarray],
        rays: jnp.ndarray, init_depth: jnp.ndarray, basis: jnp.ndarray,
        R0: jnp.ndarray, t0: jnp.ndarray,
        intr_levels: Sequence[Intrinsics],
        damping_fns: Sequence[DampingFn],
        cfg: SolverConfig,
        iters_per_level: Sequence[int] = (1, 1),
        footprint_hws=None,
):
    """Coarse-to-fine joint solve (reference runs levels 2..3, one
    iteration each, bundlenet.py:376-393).

    Returns (R, t, W, per_level) with per_level the (R, t, W) after each
    level — the reference emits all of them for supervision
    (bundlenet.py:395-397).
    """
    B, _, K = basis.shape
    R, t = R0, t0
    W = jnp.zeros((B, K), dtype=rays.dtype)
    per_level = []
    for lvl in range(len(ref_feats_levels)):
        for _ in range(iters_per_level[lvl]):
            R, t, W, _ = bundle_gn_step(
                ref_feats_levels[lvl], tgt_feats_grad_levels[lvl], rays,
                init_depth, basis, R, t, W, intr_levels[lvl],
                damping_fns[lvl], cfg,
                footprint_hw=None if footprint_hws is None
                else footprint_hws[lvl])
        per_level.append((R, t, W))
    return R, t, W, per_level


def depth_map_from_basis(init_depth_map: jnp.ndarray,
                         basis_map: jnp.ndarray,
                         W: jnp.ndarray) -> jnp.ndarray:
    """Full-resolution refined depth: D = D0 + basis . W.

    init_depth_map (B, H, W, 1), basis_map (B, H, W, K), W (B, K) ->
    (B, H, W, 1) (reference bundlenet.py:397)."""
    upd = jnp.einsum("bhwk,bk->bhw", basis_map, W)[..., None]
    return init_depth_map + upd
