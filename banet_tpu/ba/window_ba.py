"""Multi-frame window bundle adjustment with a Schur-complement solve.

New design (SURVEY.md §2.5): the reference's widest solve is one frame
pair (bundlenet.py:332); production SLAM needs a keyframe *window* — F
frames tracked against one keyframe whose depth is parameterized by K
shared basis coefficients.  The joint state is

    [ xi_1 ... xi_{F}  |  W ]     (6F + K unknowns; keyframe = gauge)

and the normal system has arrow structure: per-frame 6x6 pose blocks
C_i, pose-depth couplings E_i (6xK), one KxK depth block D:

    [ C_1          E_1 ] [dxi_1]   [g_1]
    [     ...      ... ] [ ... ] = [...]    (solve H d = -g)
    [         C_F  E_F ] [dxi_F]   [g_F]
    [ E_1^T ... E_F^T D] [ dW  ]   [ h ]

We eliminate the poses (Schur complement on the small K side):

    D~ = D - sum_i E_i^T C_i^{-1} E_i
    h~ = h - sum_i E_i^T C_i^{-1} g_i
    dW   = -D~^{-1} h~
    dxi_i = -C_i^{-1} (g_i + E_i dW)

This is exactly the shape that distributes over a TPU mesh ``frame``
axis: every per-point/per-frame contraction (the heavy part: N points x
C channels) is frame-local; the only cross-device traffic is the psum
of the tiny (K x K) and (K,) Schur terms over ICI, then a replicated
K-sized solve — see parallel/window_ba.py for the shard_map version.
This module is the single-device reference implementation (vmap over
frames), which the sharded version must match bit-for-bit modulo
reduction order.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from banet_tpu.ba.residuals import warp_residuals
from banet_tpu.config import SolverConfig
from banet_tpu.geometry.camera import Intrinsics
from banet_tpu.geometry.jacobians import camera_jacobian, depth_jacobian
from banet_tpu.geometry.se3 import se3_update


class WindowBlocks(NamedTuple):
    """Per-frame normal-equation blocks (leading axis = frame)."""

    C: jnp.ndarray   # (F, 6, 6)
    E: jnp.ndarray   # (F, 6, K)
    D: jnp.ndarray   # (F, K, K)   (to be summed over frames)
    g: jnp.ndarray   # (F, 6)
    h: jnp.ndarray   # (F, K)      (to be summed over frames)
    residual: jnp.ndarray  # (F,) mean abs residual (monitoring)
    absr: jnp.ndarray      # (F, C) per-channel mean abs residual
                           # (learned-damping input)


def frame_blocks(ref_feats: jnp.ndarray, tgt_feats_grad: jnp.ndarray,
                 rays: jnp.ndarray, init_depth: jnp.ndarray,
                 basis: jnp.ndarray, W: jnp.ndarray, R: jnp.ndarray,
                 t: jnp.ndarray, intr: Intrinsics,
                 footprint=None) -> WindowBlocks:
    """Blocks for ONE frame (no leading frame axis; vmap/shard over it).

    ref_feats (N, C); tgt_feats_grad (H, Wd, 3C) — or the raw C map
    with ``footprint="direct"`` (see ba/residuals.py); rays (N, 3);
    init_depth (N,); basis (N, K); W (K,); R (3,3); t (3,).
    """
    depth = init_depth + basis @ W
    wr = warp_residuals(ref_feats[None], tgt_feats_grad[None], rays[None],
                        depth[None], R[None], t[None], intr,
                        footprint=footprint)
    x, y, z = wr.x[0], wr.y[0], wr.z[0]
    G = wr.G[0]              # (N, C, 2)
    r = wr.residual[0]       # (N, C)
    Jc = camera_jacobian(x[None], y[None], z[None], intr.fx,
                         intr.fy)[0]          # (N, 2, 6)
    Jd = depth_jacobian(wr.rotated_rays, wr.x, wr.y, wr.z, intr.fx,
                        intr.fy)[0]           # (N, 2)
    Jw = Jd[..., None] * basis[:, None, :]    # (N, 2, K)

    H2 = jnp.einsum("nci,ncj->nij", G, G)     # (N, 2, 2)
    Gr = jnp.einsum("nci,nc->ni", G, r)       # (N, 2)

    C = jnp.einsum("nip,nij,njq->pq", Jc, H2, Jc)
    E = jnp.einsum("nip,nij,njq->pq", Jc, H2, Jw)
    D = jnp.einsum("nip,nij,njq->pq", Jw, H2, Jw)
    g = jnp.einsum("nip,ni->p", Jc, Gr)
    h = jnp.einsum("nip,ni->p", Jw, Gr)
    absr = jnp.mean(jnp.abs(r), axis=0)
    res = jnp.mean(absr)
    return WindowBlocks(C, E, D, g, h, res, absr)


def mask_blocks(blocks: WindowBlocks, m: jnp.ndarray) -> WindowBlocks:
    """Zero out the contribution of invalid frames (m (F,) in {0,1}).

    The odometry runner pads short windows to a fixed F so the jitted
    solve compiles once; padded frames must contribute NOTHING to the
    joint system (unmasked, a repeated frame double-counts its normal
    equations and biases W and every pose).  The masked frame's pose
    block is replaced by the identity so the per-frame solves stay
    well-conditioned; its (garbage-free: zero) update leaves its pose
    unchanged.
    """
    mf = m.astype(blocks.C.dtype)
    eye = jnp.eye(blocks.C.shape[-1], dtype=blocks.C.dtype)
    return WindowBlocks(
        C=blocks.C * mf[:, None, None] + (1.0 - mf)[:, None, None] * eye,
        E=blocks.E * mf[:, None, None],
        D=blocks.D * mf[:, None, None],
        g=blocks.g * mf[:, None],
        h=blocks.h * mf[:, None],
        residual=blocks.residual * mf,
        absr=blocks.absr * mf[:, None])


def _damp(M: jnp.ndarray, lam: float, floor: float) -> jnp.ndarray:
    d = jnp.diagonal(M, axis1=-2, axis2=-1)
    return M + jnp.eye(M.shape[-1], dtype=M.dtype) * ((d + floor) *
                                                      lam)[..., None]


def schur_solve(blocks: WindowBlocks, lam: float,
                diag_floor: float = 1e-5,
                lam_depth: float = None
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Solve the arrow system via the pose-eliminating Schur complement.

    blocks carry a leading frame axis F; D and h are summed here.
    ``lam_depth`` damps the depth (W) block; it defaults to ``lam`` but
    should usually be much larger — the monocular scale gauge couples a
    uniform depth change to translation, and a heavily damped W block
    pins that gauge exactly like the reference's 1000x
    l2_regularizer_base on the bundle system (bundlenet.py:393).
    Returns (delta_xi (F, 6), delta_W (K,)).
    """
    if lam_depth is None:
        lam_depth = lam
    C = _damp(blocks.C, lam, diag_floor)        # (F, 6, 6)
    D = _damp(jnp.sum(blocks.D, axis=0), lam_depth, diag_floor)  # (K, K)
    h = jnp.sum(blocks.h, axis=0)               # (K,)

    Cinv_E = jnp.linalg.solve(C, blocks.E)      # (F, 6, K)
    Cinv_g = jnp.linalg.solve(C, blocks.g[..., None])[..., 0]  # (F, 6)
    D_t = D - jnp.einsum("fpk,fpl->kl", blocks.E, Cinv_E)
    h_t = h - jnp.einsum("fpk,fp->k", blocks.E, Cinv_g)
    dW = -jnp.linalg.solve(D_t, h_t)
    dxi = -(Cinv_g + jnp.einsum("fpk,k->fp", Cinv_E, dW))
    return dxi, dW


def window_ba_step(ref_feats, tgt_feats_grads, rays, init_depth, basis,
                   Rs, ts, W, intr: Intrinsics, lam, cfg: SolverConfig,
                   lam_depth=None, damping_fn=None, frame_mask=None,
                   footprint=None):
    """One joint GN step over all window frames + shared basis coeffs.

    Shapes (F = frames tracked against the keyframe):
      ref_feats (N, C) — keyframe features at the points (shared);
      tgt_feats_grads (F, H, Wd, 3C); rays (N, 3); init_depth (N,);
      basis (N, K); Rs (F, 3, 3); ts (F, 3); W (K,).
    ``damping_fn``: optional learned-damping net ((1, C) mean |r| ->
    (1,) lambda, the BundleIteration MLP); when given it REPLACES the
    scalar ``lam`` (which then only scales it, reference
    bundlenet.py:252-253: l2_regularizer_base * lambda_prediction).
    ``frame_mask``: optional (F,) validity; masked frames contribute
    nothing to the joint system and keep their pose (window padding).
    Returns (Rs', ts', W', mean_residual (F,)).
    """
    blocks = jax.vmap(
        lambda tg, R, t: frame_blocks(ref_feats, tg, rays, init_depth,
                                      basis, W, R, t, intr, footprint)
    )(tgt_feats_grads, Rs, ts)
    n_valid = jnp.asarray(float(blocks.absr.shape[0]))
    if frame_mask is not None:
        blocks = mask_blocks(blocks, frame_mask)
        n_valid = jnp.maximum(jnp.sum(frame_mask.astype(jnp.float32)),
                              1.0)
    if damping_fn is not None:
        avg_r = (jnp.sum(blocks.absr, axis=0, keepdims=True) /
                 n_valid)  # (1, C)
        lam_learned = damping_fn(avg_r)[0]
        lam = lam * lam_learned
        if lam_depth is not None:
            lam_depth = lam_depth * lam_learned
    dxi, dW = schur_solve(blocks, lam, cfg.diag_floor, lam_depth)
    Rn, tn = se3_update(Rs, ts, dxi)
    return Rn, tn, W + dW, blocks.residual


def _mean_residual(res, frame_mask):
    """Scalar residual of a state from the per-frame residuals the
    step evaluates (already zeroed on masked frames)."""
    if frame_mask is None:
        return jnp.mean(res)
    n = jnp.maximum(jnp.sum(frame_mask.astype(res.dtype)), 1.0)
    return jnp.sum(res) / n


def _select(pred, a, b):
    """Per-leaf where(pred, a, b) over matching pytrees (autodiff-safe
    — gradients flow through the selected branch only)."""
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def solve_window_ba(ref_feats, tgt_feats_grads, rays, init_depth, basis,
                    intr: Intrinsics, cfg: SolverConfig,
                    num_iters: int = 5, lam: float = 1e-3,
                    lam_depth: float = None, Rs0=None, ts0=None,
                    damping_fn=None, frame_mask=None, footprint=None):
    """Iterated window BA from (optionally) identity initialization.

    With ``cfg.window_reject_bad_steps`` (default): Levenberg-style
    accept/reject — each iteration evaluates the current iterate's
    residual against the last ACCEPTED state; a worsening iterate is
    reverted (the revert spends the iteration) and the damping scale
    is raised x4, an improving one is accepted and the scale relaxed
    toward 1.  The returned state is the best EVALUATED one (a final
    extra evaluation scores the last step), so the joint solve can
    never hand back something worse than its warm start — the failure
    mode that made unguarded multi-keyframe window BA score worse
    than no window at all (VERDICT r4 item 3b).
    """
    F = tgt_feats_grads.shape[0]
    K = basis.shape[-1]
    Rs = Rs0 if Rs0 is not None else jnp.broadcast_to(jnp.eye(3),
                                                      (F, 3, 3))
    ts = ts0 if ts0 is not None else jnp.zeros((F, 3))
    W = jnp.zeros((K,), rays.dtype)

    def step(state, lam_scale):
        Rs, ts, W = state
        ld = None if lam_depth is None else lam_depth * lam_scale
        Rn, tn, Wn, res = window_ba_step(
            ref_feats, tgt_feats_grads, rays, init_depth, basis, Rs, ts,
            W, intr, lam * lam_scale, cfg, ld, damping_fn, frame_mask,
            footprint)
        return (Rn, tn, Wn), _mean_residual(res, frame_mask)

    if not cfg.window_reject_bad_steps:
        def body(carry, _):
            state, res = step(carry, 1.0)
            return state, res

        state, res_hist = jax.lax.scan(body, (Rs, ts, W), None,
                                       length=num_iters)
        return state[0], state[1], state[2], res_hist

    def body(carry, _):
        acc, res_acc, cur, lam_scale = carry
        nxt, res_cur = step(cur, lam_scale)
        worse = res_cur > res_acc
        acc2 = _select(worse, acc, cur)
        res_acc2 = jnp.minimum(res_acc, res_cur)
        cur2 = _select(worse, acc, nxt)
        lam_scale2 = jnp.where(worse, lam_scale * 4.0,
                               jnp.maximum(lam_scale * 0.5, 1.0))
        return (acc2, res_acc2, cur2, lam_scale2), res_cur

    init_state = (Rs, ts, W)
    (acc, res_acc, cur, _), res_hist = jax.lax.scan(
        body, (init_state, jnp.asarray(jnp.inf, rays.dtype),
               init_state, jnp.asarray(1.0, rays.dtype)),
        None, length=num_iters)
    # The final iterate was produced but never scored: one extra
    # evaluation (~1/num_iters extra cost) decides between it and the
    # best accepted state.
    _, res_final = step(cur, 1.0)
    best = _select(res_final < res_acc, cur, acc)
    return best[0], best[1], best[2], res_hist
