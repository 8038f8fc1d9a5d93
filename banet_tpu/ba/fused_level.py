"""Pose-level GN solve driven by the fused Pallas iteration kernel.

Per iteration, XLA contributes exactly the pose-dependent pieces the
kernel cannot own — the warp math, the 4 tap row-gathers (native XLA
gather, measured at bandwidth), and the projection-Jacobian rows — and
the Pallas kernel (ops/pallas_gn_tail.py) does everything else in one
program.  A level solve is one ``lax.fori_loop`` whose body is
[small XLA fusion -> 4 gathers -> 1 Pallas kernel], versus the ~20
small kernels per iteration of the pure-XLA scan path.

Semantics match ba/camera_solver.solve_pose_level in outcome (same
warp-reuse, rejection-freezes, early-exit rules); the one deliberate
difference is that a converged step below the early-exit thresholds is
not applied (the scan path applies it then stops) — a sub-threshold
(<2e-4 m / <0.002 deg) discrepancy.  Parity is tested in
tests/test_pallas_tail.py.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp

from banet_tpu.config import SolverConfig
from banet_tpu.geometry.camera import Intrinsics, warp_points
from banet_tpu.geometry.jacobians import camera_jacobian
from banet_tpu.ops.pallas_gn_tail import (gn_tail_step, initial_state,
                                          pack_pose, unpack_pose)

# Test hook: force interpret mode (e.g. CPU CI) for the whole module.
_FORCE_INTERPRET = os.environ.get("BANET_PALLAS_INTERPRET", "") == "1"


def _tap_inputs(tgt_flat, height, width, rays, depth, R, t,
                intr: Intrinsics):
    """Warp + gather the kernel's inputs at pose (R (3,3), t (3,)).

    tgt_flat: (H*W, C) row-major level map.  Returns (taps 4x(N, C),
    pw (N, 8), juv (N, 16))."""
    N = rays.shape[0]
    px, py, x, y, z, _Rp = warp_points(rays[None], depth[None], R[None],
                                       t[None], intr)
    px, py, x, y, z = px[0], py[0], x[0], y[0], z[0]
    W, H = width, height
    pxc = jnp.clip(px, -2.0, W + 1.0)
    pyc = jnp.clip(py, -2.0, H + 1.0)
    x0f = jnp.floor(pxc)
    y0f = jnp.floor(pyc)
    wx = pxc - x0f
    wy = pyc - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    def tap(xi, yi):
        valid = ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H))
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        vals = jnp.take(tgt_flat, idx, axis=0)
        return vals * valid.astype(tgt_flat.dtype)[:, None]

    taps = (tap(x0, y0), tap(x0 + 1, y0), tap(x0, y0 + 1),
            tap(x0 + 1, y0 + 1))
    mask = ((px >= 0) & (px <= W - 1) & (py >= 0) &
            (py <= H - 1)).astype(jnp.float32)
    pw = jnp.stack([wx, wy, mask] + [jnp.zeros_like(wx)] * 5, axis=-1)
    J = camera_jacobian(x[None], y[None], z[None], intr.fx, intr.fy)[0]
    zeros2 = jnp.zeros((N, 2), jnp.float32)
    juv = jnp.concatenate([J[:, 0, :], zeros2, J[:, 1, :], zeros2],
                          axis=-1)
    return taps, pw, juv


def solve_pose_level_fused(ref_feats, tgt_feats, rays, depth, R0, t0,
                           intr: Intrinsics, mlp_params,
                           num_iters: int, cfg: SolverConfig,
                           renormalize_residual: bool = False,
                           exp_base: float = 2.0,
                           interpret: bool = False):
    """Single-problem level solve (no batch axis; vmap for batches).

    ref_feats (N, C); tgt_feats (H, W, C) RAW level map (direct
    sampler); rays (N, 3); depth (N,); R0 (3, 3); t0 (3,); mlp_params:
    the level's DampingNet param subtree.  Returns (R, t, state (1,8))
    with state cols [res, done, -, lam, accepted, keep_ratio].
    """
    H, W, C = tgt_feats.shape
    tgt_flat = tgt_feats.reshape(H * W, C).astype(jnp.float32)

    def body(_, carry):
        pose, state = carry
        Rp, tp, _Rc, _tc = unpack_pose(pose)
        taps, pw, juv = _tap_inputs(tgt_flat, H, W, rays, depth, Rp, tp,
                                    intr)
        pose, state = gn_tail_step(
            taps, ref_feats.astype(jnp.float32), pw, juv, pose, state,
            mlp_params, exp_base=exp_base,
            residual_ratio=cfg.residual_ratio,
            diag_floor=cfg.diag_floor,
            renormalize=renormalize_residual,
            reject=cfg.reject_bad_steps,
            early_term=cfg.early_termination,
            angle_change=cfg.angle_change,
            translation_change=cfg.translation_change,
            interpret=interpret or _FORCE_INTERPRET)
        return pose, state

    carry0 = (pack_pose(R0, t0), initial_state())
    # n proposals are tested by n+1 kernel calls (call k tests the
    # proposal made by call k-1; call 0 accepts the entry pose).
    pose, state = jax.lax.fori_loop(0, num_iters + 1, body, carry0)
    _Rp, _tp, Rc, tc = unpack_pose(pose)
    return Rc, tc, state


def solve_pose_pyramid_fused(ref_feats_levels: Sequence[jnp.ndarray],
                             tgt_feats_levels: Sequence[jnp.ndarray],
                             rays, depth, R0, t0,
                             intr_levels: Sequence[Intrinsics],
                             mlp_params_levels: Sequence,
                             cfg: SolverConfig,
                             renormalize_residual: bool = False,
                             exp_base: float = 2.0,
                             interpret: bool = False):
    """Coarse-to-fine fused solve (single problem).  Mirrors
    ba/camera_solver.solve_pose_pyramid with raw level maps."""
    R, t = R0, t0
    state = None
    for lvl in range(len(ref_feats_levels)):
        R, t, state = solve_pose_level_fused(
            ref_feats_levels[lvl], tgt_feats_levels[lvl], rays, depth,
            R, t, intr_levels[lvl], mlp_params_levels[lvl],
            cfg.level_iters[lvl], cfg, renormalize_residual, exp_base,
            interpret)
    return R, t, state
