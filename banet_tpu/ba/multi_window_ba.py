"""Multi-keyframe window bundle adjustment.

Generalizes ba/window_ba.py (one keyframe, basis replicated) to the
BASELINE north star's "partitioning keyframes and map blocks ...
pose-graph consistency across shards": M keyframes, each with its own
point set, depth-basis coefficients W_m, and pose, observed by F target
frames.  The reference's widest solve is a single frame pair
(reference bundlenet.py:332-399); this joint window is new design.

State (window coordinates = keyframe 0's camera; keyframe 0 pinned as
the gauge):

    [ xi_1 .. xi_F | xi_k1 .. xi_k(M-1) | W_0 .. W_(M-1) ]

An observation is a (keyframe m, frame f) pair: keyframe m's points,
at depth d = d0_m + B_m W_m, are lifted to window coordinates through
T_km^{-1} and projected into frame f through T_f; the feature residual
against keyframe m's point features is weighted by the sampled target
gradients (same residual structure as the single-keyframe solver).
Out-of-view points self-mask through the sampler's in-bounds mask, so
"shared covisible points" need no explicit bookkeeping; ``obs_mask``
additionally gates whole (m, f) pairs (e.g. frames that predate a
keyframe).

Elimination order: each W_m couples only to pose variables (never to
another W), so the basis block is block-diagonal and the W's are
eliminated first — the reduced system is a dense pose system of size
P = 6F + 6(M-1) (tens of unknowns), solved replicated.  Distribution
(parallel/multi_window_ba.py) shards frames; the only cross-device
traffic is ONE fused psum of the reduced blocks (P^2 + M K (P + K) + P
floats, ~30 KB for F=4, M=2, K=32) — O(1) in mesh size, same invariant
as the single-keyframe solver.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from banet_tpu.config import SolverConfig
from banet_tpu.geometry.camera import Intrinsics
from banet_tpu.geometry.se3 import se3_update
from banet_tpu.ops.resample import bilinear_sample_with_mask


class MultiWindowProblem(NamedTuple):
    """Static per-window data.  M keyframes, F frames, N points each.

    ref_feats (M, N, C): keyframe point features;
    rays (M, N, 3): keyframe-camera rays at the points (z=1 or unit);
    init_depth (M, N); basis (M, N, K);
    tgt_fg (F, H, W, 3C): target feature+gradient stacks;
    obs_mask (M, F): 1 where frame f observes keyframe m.
    """

    ref_feats: jnp.ndarray
    rays: jnp.ndarray
    init_depth: jnp.ndarray
    basis: jnp.ndarray
    tgt_fg: jnp.ndarray
    obs_mask: jnp.ndarray


def _proj_jacobian(x, y, z, fx, fy):
    """d(px,py)/dX_f for X_f = (X, Y, Z), x = X/Z, y = Y/Z: (N, 2, 3)."""
    inv_z = 1.0 / z
    zeros = jnp.zeros_like(x)
    row_u = jnp.stack([fx * inv_z, zeros, -fx * x * inv_z], axis=-1)
    row_v = jnp.stack([zeros, fy * inv_z, -fy * y * inv_z], axis=-1)
    return jnp.stack([row_u, row_v], axis=-2)


def _hat(v):
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack([
        jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
        jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
        jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
    ], axis=-2)


class PairBlocks(NamedTuple):
    """Normal-equation pieces of one (keyframe m, frame f) observation."""

    Hff: jnp.ndarray   # (6, 6)
    Hfm: jnp.ndarray   # (6, 6)  frame-keyframe coupling
    Hmm: jnp.ndarray   # (6, 6)
    gf: jnp.ndarray    # (6,)
    gm: jnp.ndarray    # (6,)
    Uf: jnp.ndarray    # (6, K)  frame-basis coupling
    Um: jnp.ndarray    # (6, K)  keyframe-basis coupling
    D: jnp.ndarray     # (K, K)
    h: jnp.ndarray     # (K,)
    absr: jnp.ndarray  # (C,) sum |r| (damping statistics)
    count: jnp.ndarray  # () valid-point count


def pair_blocks(ref_feats, rays, init_depth, basis, W,
                tgt_fg, R_f, t_f, R_m, t_m, intr: Intrinsics,
                valid) -> PairBlocks:
    """Blocks for ONE (keyframe, frame) observation (no batch axes).

    ref_feats (N, C); rays (N, 3); init_depth (N,); basis (N, K);
    W (K,); tgt_fg (H, Wd, 3C); poses cam-from-window; valid scalar
    {0,1} gating the whole pair.
    """
    C = ref_feats.shape[-1]
    depth = init_depth + basis @ W
    X_m = rays * depth[:, None]                     # keyframe cam coords
    R_rel = R_f @ R_m.T
    t_rel = t_f - R_rel @ t_m
    X_f = X_m @ R_rel.T + t_rel[None, :]            # (N, 3)
    z_raw = X_f[:, 2]
    z = jnp.where(z_raw >= 0, jnp.maximum(z_raw, 1e-6),
                  jnp.minimum(z_raw, -1e-6))
    x = X_f[:, 0] / z
    y = X_f[:, 1] / z
    fx = intr.fx.reshape(())
    fy = intr.fy.reshape(())
    px = fx * x + intr.cx.reshape(())
    py = fy * y + intr.cy.reshape(())

    sampled, mask = bilinear_sample_with_mask(tgt_fg[None], px[None],
                                              py[None])
    sampled, mask = sampled[0], mask[0] * valid     # (N, 3C), (N,)
    f = sampled[:, :C]
    G = jnp.stack([sampled[:, C:2 * C], sampled[:, 2 * C:]],
                  axis=-1) * mask[:, None, None]    # (N, C, 2)
    r = (f - ref_feats) * mask[:, None]             # (N, C)

    Jp = _proj_jacobian(x, y, z, fx, fy)            # (N, 2, 3)
    # Frame pose (left-perturb T_f): X_f' ~ X_f + dw x X_f + du.
    Jf = jnp.concatenate([-Jp @ _hat(X_f), Jp], axis=-1)   # (N, 2, 6)
    # Keyframe pose (left-perturb T_m): X_f' ~ X_f - R_rel(dw x X_m + du).
    RJp = Jp @ R_rel                                 # (N, 2, 3)
    Jm = jnp.concatenate([RJp @ _hat(X_m), -RJp], axis=-1)  # (N, 2, 6)
    # Basis: dX_f/dd = R_rel @ ray, per-point scalar chain to (2,).
    Jd = jnp.einsum("nij,nj->ni", RJp, rays)         # (N, 2)
    Jw = Jd[:, :, None] * basis[:, None, :]          # (N, 2, K)

    H2 = jnp.einsum("nci,ncj->nij", G, G)            # (N, 2, 2)
    Gr = jnp.einsum("nci,nc->ni", G, r)              # (N, 2)

    def quad(A, B):
        return jnp.einsum("nip,nij,njq->pq", A, H2, B)

    def lin(A):
        return jnp.einsum("nip,ni->p", A, Gr)

    return PairBlocks(
        Hff=quad(Jf, Jf), Hfm=quad(Jf, Jm), Hmm=quad(Jm, Jm),
        gf=lin(Jf), gm=lin(Jm),
        Uf=quad(Jf, Jw), Um=quad(Jm, Jw), D=quad(Jw, Jw), h=lin(Jw),
        absr=jnp.sum(jnp.abs(r), axis=0), count=jnp.sum(mask))


def _damp_diag(M, lam, floor):
    d = jnp.diagonal(M, axis1=-2, axis2=-1)
    return M + jnp.eye(M.shape[-1], dtype=M.dtype) * ((d + floor) *
                                                      lam)[..., None]


def assemble_dense(blocks: PairBlocks, num_frames: int,
                   num_keyframes: int, frame_offset: int = 0,
                   total_frames: Optional[int] = None):
    """Place per-(m, f) blocks (leading axes (M, F_local)) into the
    global dense system.

    ``frame_offset``/``total_frames`` support frame-sharded assembly:
    local frame f sits at global index frame_offset + f (a traced
    offset is fine — placement uses dynamic_update_slice), and the
    returned arrays are sized for ``total_frames`` so a cross-shard
    psum of the partials yields the full system.

    Returns (H (P, P), g (P,), U (M, P, K), D (M, K, K), h (M, K)).
    """
    M, F = num_keyframes, num_frames
    Ft = total_frames if total_frames is not None else F
    K = blocks.D.shape[-1]
    P = 6 * Ft + 6 * (M - 1)

    H = jnp.zeros((P, P))
    g = jnp.zeros((P,))
    U = jnp.zeros((M, P, K))

    def ks(m):
        return 6 * Ft + 6 * (m - 1)

    # Frame-diagonal pieces, accumulated over keyframes first so each
    # frame needs a single (possibly dynamic-offset) placement.
    Hff = jnp.sum(blocks.Hff, axis=0)                # (F, 6, 6)
    gf = jnp.sum(blocks.gf, axis=0)                  # (F, 6)
    for f in range(F):
        row = 6 * (frame_offset + f) if frame_offset is not None else 6 * f
        H = jax.lax.dynamic_update_slice(H, Hff[f], (row, row))
        g = jax.lax.dynamic_update_slice(g, gf[f], (row,))
        for m in range(M):
            U = jax.lax.dynamic_update_slice(
                U, blocks.Uf[m, f][None], (m, row, 0))
            if m > 0:
                H = jax.lax.dynamic_update_slice(
                    H, blocks.Hfm[m, f], (row, ks(m)))
                H = jax.lax.dynamic_update_slice(
                    H, blocks.Hfm[m, f].T, (ks(m), row))
    for m in range(1, M):
        H = H.at[ks(m):ks(m) + 6, ks(m):ks(m) + 6].add(
            jnp.sum(blocks.Hmm[m], axis=0))
        g = g.at[ks(m):ks(m) + 6].add(jnp.sum(blocks.gm[m], axis=0))
        U = U.at[m, ks(m):ks(m) + 6, :].add(
            jnp.sum(blocks.Um[m], axis=0))

    D = jnp.sum(blocks.D, axis=1)                    # (M, K, K)
    h = jnp.sum(blocks.h, axis=1)                    # (M, K)
    return H, g, U, D, h


def solve_reduced(H, g, U, D, h, num_frames: int, num_keyframes: int,
                  lam, lam_depth, diag_floor: float):
    """Eliminate the (block-diagonal) bases and solve the dense pose
    system.  Returns (dxi_frames (F, 6), dxi_keyframes (M, 6; row 0
    zero), dW (M, K))."""
    M, F = num_keyframes, num_frames
    Dd = _damp_diag(D, lam_depth, diag_floor)
    Dinv_Ut = jnp.linalg.solve(Dd, jnp.swapaxes(U, -1, -2))  # (M, K, P)
    Dinv_h = jnp.linalg.solve(Dd, h[..., None])[..., 0]      # (M, K)
    H_red = H - jnp.einsum("mpk,mkq->pq", U, Dinv_Ut)
    g_red = g - jnp.einsum("mpk,mk->p", U, Dinv_h)

    H_red = _damp_diag(H_red, lam, diag_floor)
    dxi = -jnp.linalg.solve(H_red, g_red[:, None])[:, 0]     # (P,)

    dW = -(Dinv_h + jnp.einsum("mkp,p->mk", Dinv_Ut, dxi))   # (M, K)
    dxi_f = dxi[:6 * F].reshape(F, 6)
    dxi_k = jnp.concatenate(
        [jnp.zeros((1, 6)), dxi[6 * F:].reshape(M - 1, 6)], axis=0)
    return dxi_f, dxi_k, dW


def reduce_and_solve(blocks: PairBlocks, num_frames: int,
                     num_keyframes: int, lam, lam_depth,
                     diag_floor: float):
    """Assemble the global system from per-(m, f) blocks (leading axes
    (M, F)), eliminate the bases, solve the reduced pose system.

    Returns (dxi_frames (F, 6), dxi_keyframes (M, 6; row 0 zero),
    dW (M, K)).
    """
    H, g, U, D, h = assemble_dense(blocks, num_frames, num_keyframes)
    return solve_reduced(H, g, U, D, h, num_frames, num_keyframes, lam,
                         lam_depth, diag_floor)


def multi_window_ba_step(prob: MultiWindowProblem, Rs_f, ts_f, Rs_k,
                         ts_k, Ws, intr: Intrinsics, lam,
                         cfg: SolverConfig, lam_depth=None,
                         damping_fn=None):
    """One joint GN step.  Shapes: Rs_f (F,3,3), ts_f (F,3);
    Rs_k (M,3,3), ts_k (M,3) (row 0 = gauge, held fixed); Ws (M,K).
    Returns updated (Rs_f, ts_f, Rs_k, ts_k, Ws, mean_residual)."""
    if lam_depth is None:
        lam_depth = lam
    M = prob.ref_feats.shape[0]
    F = prob.tgt_fg.shape[0]

    def one_pair(m, f):
        return pair_blocks(
            prob.ref_feats[m], prob.rays[m], prob.init_depth[m],
            prob.basis[m], Ws[m], prob.tgt_fg[f], Rs_f[f], ts_f[f],
            Rs_k[m], ts_k[m], intr, prob.obs_mask[m, f])

    blocks = jax.vmap(lambda m: jax.vmap(lambda f: one_pair(m, f))(
        jnp.arange(F)))(jnp.arange(M))

    if damping_fn is not None:
        total = jnp.maximum(jnp.sum(blocks.count), 1.0)
        avg_r = (jnp.sum(blocks.absr, axis=(0, 1)) / total)[None]
        lam_learned = damping_fn(avg_r)[0]
        lam = lam * lam_learned
        lam_depth = lam_depth * lam_learned

    dxi_f, dxi_k, dW = reduce_and_solve(blocks, F, M, lam, lam_depth,
                                        cfg.diag_floor)
    Rs_f, ts_f = se3_update(Rs_f, ts_f, dxi_f)
    Rk_new, tk_new = se3_update(Rs_k, ts_k, dxi_k)
    # Gauge: keyframe 0 never moves (dxi_k[0] is structurally zero, but
    # pin explicitly against numerical drift).
    Rs_k = Rs_k.at[1:].set(Rk_new[1:])
    ts_k = ts_k.at[1:].set(tk_new[1:])
    Ws = Ws + dW
    mean_res = jnp.sum(blocks.absr) / jnp.maximum(
        jnp.sum(blocks.count) * blocks.absr.shape[-1], 1.0)
    return Rs_f, ts_f, Rs_k, ts_k, Ws, mean_res


def solve_multi_window_ba(prob: MultiWindowProblem, intr: Intrinsics,
                          cfg: SolverConfig, num_iters: int = 5,
                          lam: float = 1e-3, lam_depth: float = 1.0,
                          Rs_f0=None, ts_f0=None, Rs_k0=None,
                          ts_k0=None, damping_fn=None):
    """Iterated multi-keyframe window BA.

    Keyframe poses default to identity (all keyframes at the window
    origin — callers with odometry estimates should pass them).
    Returns (Rs_f, ts_f, Rs_k, ts_k, Ws (M, K), residual_history).
    """
    from banet_tpu.ba.window_ba import _select

    M = prob.ref_feats.shape[0]
    F = prob.tgt_fg.shape[0]
    K = prob.basis.shape[-1]
    Rs_f = Rs_f0 if Rs_f0 is not None else jnp.broadcast_to(
        jnp.eye(3), (F, 3, 3))
    ts_f = ts_f0 if ts_f0 is not None else jnp.zeros((F, 3))
    Rs_k = Rs_k0 if Rs_k0 is not None else jnp.broadcast_to(
        jnp.eye(3), (M, 3, 3))
    ts_k = ts_k0 if ts_k0 is not None else jnp.zeros((M, 3))
    Ws = jnp.zeros((M, K))

    def step(state, lam_scale):
        Rf, tf, Rk, tk, W = state
        Rf, tf, Rk, tk, W, res = multi_window_ba_step(
            prob, Rf, tf, Rk, tk, W, intr, lam * lam_scale, cfg,
            None if lam_depth is None else lam_depth * lam_scale,
            damping_fn)
        return (Rf, tf, Rk, tk, W), res

    init_state = (Rs_f, ts_f, Rs_k, ts_k, Ws)
    if not cfg.window_reject_bad_steps:
        def body(carry, _):
            state, res = step(carry, 1.0)
            return state, res

        state, hist = jax.lax.scan(body, init_state, None,
                                   length=num_iters)
        return (*state, hist)

    # Levenberg-style accept/reject (shared rationale + structure with
    # ba/window_ba.solve_window_ba): revert worsening iterates, raise
    # the damping scale, and return the best EVALUATED state — the
    # unguarded multi-keyframe solve measurably undid good tracked
    # warm starts (VERDICT r4 item 3b).
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

    (acc, res_acc, cur, _), hist = jax.lax.scan(
        body, (init_state, jnp.asarray(jnp.inf, jnp.float32),
               init_state, jnp.asarray(1.0, jnp.float32)),
        None, length=num_iters)
    _, res_final = step(cur, 1.0)
    best = _select(res_final < res_acc, cur, acc)
    return (*best, hist)
