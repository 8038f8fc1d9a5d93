"""Pose-only damped Gauss-Newton solver (the tracking hot loop).

Equivalent of reference ``CameraIteration``/``CameraIteration2`` and the
coarse-to-fine driver loops (reference bundlenet.py:122-191, :280-329;
legacy/ba.py:85-145, :226-345), redesigned for XLA:

- the per-level iteration loop is a fixed-trip ``lax.scan`` (static
  shapes, one trace);  the reference's ``tf.while_loop`` early exit
  (legacy/ba.py:132-140) becomes a ``done`` flag in the scan carry that
  freezes further updates — converged problems do the remaining
  iterations as masked no-ops, which on TPU is cheaper than dynamic
  trip counts (SURVEY.md §7 hard part #2);
- step rejection (accept only if the re-warped residual decreases,
  legacy/ba.py:304-345) is a ``jnp.where`` select per batch element;
- all solver state is a pytree carry, so the whole pyramid solve jits,
  vmaps over pairs, and shards over a mesh ``data`` axis unchanged.

Each iteration: warp -> sample residual/gradients -> learned lambda ->
normal equations -> damped solve -> left-composed SE(3) update.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from banet_tpu.ba.residuals import WarpResult, warp_residuals
from banet_tpu.config import SolverConfig
from banet_tpu.geometry.camera import Intrinsics
from banet_tpu.geometry.jacobians import camera_jacobian
from banet_tpu.geometry.se3 import se3_update
from banet_tpu.ops.normal_eq import build_normal_equations
from banet_tpu.ops.solve import damped_solve

# damping_fn: per-channel mean |residual| (B, C) -> lambda (B,)
DampingFn = Callable[[jnp.ndarray], jnp.ndarray]


class PoseStepAux(NamedTuple):
    accepted: jnp.ndarray        # (B,) 1.0 where the step was taken
    dw: jnp.ndarray              # (B,) |rotation update| (0 if rejected)
    dt: jnp.ndarray              # (B,) |translation update| (0 if rejected)
    residual_before: jnp.ndarray  # (B,)
    residual_after: jnp.ndarray   # (B,) at the *proposed* pose
    keep_ratio: jnp.ndarray      # (B,) in-bounds fraction at entry pose
    lam: jnp.ndarray             # (B,) learned damping
    iters_run: jnp.ndarray       # (B,) GN iterations actually executed
    #   (active, pre-convergence).  From solve_pose_level: this level's
    #   count; from solve_pose_pyramid: the total across levels.  Basis
    #   for honest executed-work accounting in bench.py.


def _scalar_residual(wr: WarpResult, renormalize: bool) -> jnp.ndarray:
    """(B,) scalar residual used by the accept test (legacy/ba.py:268,
    275: mean over channels of the valid-renormalized per-channel mean)."""
    return jnp.mean(wr.avg_abs_residual(renormalize), axis=-1)


def pose_gn_step(
        ref_feats: jnp.ndarray, tgt_feats_grad: jnp.ndarray,
        rays: jnp.ndarray, depth: jnp.ndarray,
        R: jnp.ndarray, t: jnp.ndarray, intr: Intrinsics,
        damping_fn: DampingFn, cfg: SolverConfig,
        renormalize_residual: bool = True,
        footprint_hw=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, PoseStepAux]:
    """One damped GN step over the 6-dof pose.

    Shapes: ref_feats (B, N, C); tgt_feats_grad (B, H, W, 3C) — or the
    level's footprint map with ``footprint_hw=(H, W)`` (one-gather
    sampler, ops/resample.py); rays (B, N, 3); depth (B, N);
    R (B, 3, 3); t (B, 3).
    """
    wr = warp_residuals(ref_feats, tgt_feats_grad, rays, depth, R, t,
                        intr, footprint=footprint_hw)
    avg_r = wr.avg_abs_residual(renormalize_residual)
    res_before = jnp.mean(avg_r, axis=-1)
    lam = damping_fn(avg_r)

    J = camera_jacobian(wr.x, wr.y, wr.z, intr.fx, intr.fy)
    AtA, Atb = build_normal_equations(J, wr.G, wr.residual)
    delta = -damped_solve(AtA, Atb, lam, cfg.diag_floor, damp_last=True)
    R_prop, t_prop = se3_update(R, t, delta)

    if cfg.reject_bad_steps:
        wr_after = warp_residuals(ref_feats, tgt_feats_grad, rays, depth,
                                  R_prop, t_prop, intr,
                                  footprint=footprint_hw)
        res_after = _scalar_residual(wr_after, renormalize_residual)
        accept = (res_after < cfg.residual_ratio * res_before)
    else:
        res_after = res_before
        accept = jnp.ones_like(res_before, dtype=bool)

    acc3 = accept[:, None, None]
    R_new = jnp.where(acc3, R_prop, R)
    t_new = jnp.where(accept[:, None], t_prop, t)
    acc_f = accept.astype(delta.dtype)
    aux = PoseStepAux(
        accepted=acc_f,
        dw=jnp.linalg.norm(delta[:, :3], axis=-1) * acc_f,
        dt=jnp.linalg.norm(delta[:, 3:], axis=-1) * acc_f,
        residual_before=res_before,
        residual_after=res_after,
        keep_ratio=wr.keep_ratio,
        lam=lam,
        iters_run=jnp.ones_like(res_before),
    )
    return R_new, t_new, aux


def solve_pose_level(
        ref_feats: jnp.ndarray, tgt_feats_grad: jnp.ndarray,
        rays: jnp.ndarray, depth: jnp.ndarray,
        R0: jnp.ndarray, t0: jnp.ndarray, intr: Intrinsics,
        damping_fn: DampingFn, num_iters: int, cfg: SolverConfig,
        renormalize_residual: bool = True,
        footprint_hw=None,
):
    """Fixed-trip scan of GN steps with early-termination masking.

    Mirrors the reference while_loop semantics (legacy/ba.py:132-140):
    iterate until |dw| < angle_change and |dt| < translation_change.
    Note a *rejected* step reports dw = dt = 0 and therefore also
    terminates — the reference behaves identically since its rejected
    branch returns zero update norms (legacy/ba.py:343-345).

    Returns (R, t, aux_last) where aux_last is the PoseStepAux of the
    final *active* iteration (entries frozen after termination).
    """

    # The warp at the *entry* pose is computed once and carried: each
    # iteration proposes a step from the carried warp, warps once at the
    # proposed pose (for the accept test), and on acceptance reuses that
    # warp as the next iteration's base.  One warp per iteration instead
    # of the naive two (the reference re-warps for its CheckUpdate and
    # then warps again next iteration, legacy/ba.py:238,306).

    def gn_from_warp(wr: WarpResult, R, t):
        avg_r = wr.avg_abs_residual(renormalize_residual)
        res_before = jnp.mean(avg_r, axis=-1)
        lam = damping_fn(avg_r)
        J = camera_jacobian(wr.x, wr.y, wr.z, intr.fx, intr.fy)
        AtA, Atb = build_normal_equations(J, wr.G, wr.residual)
        delta = -damped_solve(AtA, Atb, lam, cfg.diag_floor,
                              damp_last=True)
        R_prop, t_prop = se3_update(R, t, delta)
        return R_prop, t_prop, delta, res_before, lam

    def body(carry, _):
        R, t, wr, done, last_aux = carry
        R_prop, t_prop, delta, res_before, lam = gn_from_warp(wr, R, t)
        wr_prop = warp_residuals(ref_feats, tgt_feats_grad, rays, depth,
                                 R_prop, t_prop, intr,
                                 footprint=footprint_hw)
        if cfg.reject_bad_steps:
            res_after = _scalar_residual(wr_prop, renormalize_residual)
            accept = res_after < cfg.residual_ratio * res_before
        else:
            res_after = res_before
            accept = jnp.ones_like(res_before, dtype=bool)

        take = accept & ~done
        tk3 = take[:, None, None]
        R = jnp.where(tk3, R_prop, R)
        t = jnp.where(take[:, None], t_prop, t)
        wr = jax.tree.map(
            lambda new, old: jnp.where(
                take.reshape(take.shape + (1,) * (new.ndim - 1)), new,
                old), wr_prop, wr)

        acc_f = take.astype(delta.dtype)
        aux = PoseStepAux(
            accepted=acc_f,
            dw=jnp.linalg.norm(delta[:, :3], axis=-1) * acc_f,
            dt=jnp.linalg.norm(delta[:, 3:], axis=-1) * acc_f,
            residual_before=res_before,
            residual_after=res_after,
            keep_ratio=wr.keep_ratio,
            lam=lam,
            iters_run=last_aux.iters_run,  # accumulated below, not frozen
        )
        active = ~done
        aux = jax.tree.map(
            lambda new, old: jnp.where(active, new, old), aux, last_aux)
        aux = aux._replace(
            iters_run=last_aux.iters_run + active.astype(R.dtype))
        if cfg.early_termination:
            converged = ((aux.dw < cfg.angle_change) &
                         (aux.dt < cfg.translation_change))
            done = done | (active & converged)
        return (R, t, wr, done, aux), None

    B = R0.shape[0]
    wr0 = warp_residuals(ref_feats, tgt_feats_grad, rays, depth, R0, t0,
                         intr, footprint=footprint_hw)
    aux0 = PoseStepAux(*(jnp.zeros((B,), R0.dtype) for _ in range(8)))
    done0 = jnp.zeros((B,), dtype=bool)
    carry0 = (R0, t0, wr0, done0, aux0)
    if cfg.dynamic_early_exit:
        # Inference: actually stop when every batch element converged
        # (the reference's while_loop semantics, legacy/ba.py:132-140,
        # back_prop=False).  Saves the masked no-op iterations the scan
        # would still execute.
        def cond(state):
            i, carry = state
            done = carry[3]
            return (i < num_iters) & jnp.any(~done)

        def wbody(state):
            i, carry = state
            carry, _ = body(carry, None)
            return (i + 1, carry)

        _, (R, t, _, _, aux) = jax.lax.while_loop(
            cond, wbody, (jnp.int32(0), carry0))
    else:
        (R, t, _, _, aux), _ = jax.lax.scan(
            body, carry0, None, length=num_iters)
    return R, t, aux


def solve_pose_pyramid(
        ref_feats_levels: Sequence[jnp.ndarray],
        tgt_feats_grad_levels: Sequence[jnp.ndarray],
        rays: jnp.ndarray, depth: jnp.ndarray,
        R0: jnp.ndarray, t0: jnp.ndarray,
        intr_levels: Sequence[Intrinsics],
        damping_fns: Sequence[DampingFn],
        cfg: SolverConfig,
        renormalize_residual: bool = True,
        return_per_level: bool = False,
        footprint_hws=None,
):
    """Coarse-to-fine pose solve over a feature pyramid.

    Level data arrives coarse -> fine (the reference iterates level 1..3
    at scales 4, 2, 1, legacy/ba.py:106-113, or 0..3 at scales 8..1,
    bundlenet.py:309-315; the caller picks which levels to include).
    ``rays`` are shared across levels; only intrinsics rescale.
    """
    assert len(ref_feats_levels) == len(tgt_feats_grad_levels) == \
        len(intr_levels) == len(damping_fns)
    iters = cfg.level_iters
    assert len(iters) >= len(ref_feats_levels)
    R, t = R0, t0
    per_level = []
    aux = None
    iters_total = jnp.zeros((R0.shape[0],), R0.dtype)
    for lvl in range(len(ref_feats_levels)):
        R, t, aux = solve_pose_level(
            ref_feats_levels[lvl], tgt_feats_grad_levels[lvl], rays, depth,
            R, t, intr_levels[lvl], damping_fns[lvl], iters[lvl], cfg,
            renormalize_residual,
            footprint_hw=None if footprint_hws is None
            else footprint_hws[lvl])
        iters_total = iters_total + aux.iters_run
        per_level.append((R, t))
    # aux.iters_run at pyramid granularity = total across levels.
    aux = aux._replace(iters_run=iters_total)
    if return_per_level:
        return R, t, aux, per_level
    return R, t, aux
