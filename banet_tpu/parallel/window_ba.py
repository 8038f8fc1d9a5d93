"""Distributed window BA: frame-sharded blocks + psum'd Schur terms.

The multi-device form of ba/window_ba.py (SURVEY.md §2.5 "Distributed
Schur-complement reduced-camera solve"):

- each device on the ``frame`` mesh axis holds a shard of the window's
  target frames and computes its per-frame normal-equation blocks
  C_i, E_i, D_i, g_i, h_i locally — this is the heavy part (N points x
  C channels x frames), zero communication;
- the Schur reduction needs only sum_i over ALL frames of the tiny
  (K x K) D~ and (K,) h~ terms -> one ``lax.psum`` over ``frame``
  (rides ICI; ~K^2 * 4 bytes = 4 KB for K = 32);
- the reduced K x K solve is replicated (cheaper than communicating a
  factorization), and the per-frame pose back-substitution is local.

Gauge consistency across shards (SURVEY.md §7 hard part #5) is free by
construction: the keyframe pose is pinned (never a variable) and W is
fully replicated after the psum'd solve, so every shard sees the same
reduced system bit-for-bit (psum is deterministic for a fixed mesh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from banet_tpu.ba.window_ba import _damp, frame_blocks, mask_blocks
from banet_tpu.config import SolverConfig
from banet_tpu.geometry.camera import Intrinsics
from banet_tpu.geometry.se3 import se3_update


def sharded_window_ba_step(mesh: Mesh, ref_feats, tgt_feats_grads, rays,
                           init_depth, basis, Rs, ts, W,
                           intr: Intrinsics, lam: float,
                           cfg: SolverConfig, lam_depth: float = None,
                           damping_fn=None, frame_mask=None):
    """One window-BA GN step with frames sharded over mesh axis "frame".

    Same signature/semantics as ba.window_ba.window_ba_step; shapes
    carry the full (unsharded) window and the shard_map decomposes them.
    F must be divisible by the frame-axis size.
    """
    if frame_mask is None:
        frame_mask = jnp.ones((tgt_feats_grads.shape[0],), jnp.float32)

    def step_shard(ref_feats, tgt_fg, rays, init_depth, basis, Rs, ts, W,
                   fmask):
        # tgt_fg/Rs/ts/fmask: local frame shard; the rest replicated.
        blocks = jax.vmap(
            lambda tg, R, t: frame_blocks(ref_feats, tg, rays, init_depth,
                                          basis, W, R, t, intr)
        )(tgt_fg, Rs, ts)
        blocks = mask_blocks(blocks, fmask)

        local_lam = lam
        local_lam_depth = lam_depth
        if damping_fn is not None:
            # Learned damping from the GLOBAL mean residual over VALID
            # frames: psum the tiny per-channel stats (C floats + one
            # count) so every shard applies the identical lambda.
            absr_sum, n_valid = jax.lax.psum(
                (jnp.sum(blocks.absr, axis=0),
                 jnp.sum(fmask.astype(jnp.float32))), "frame")
            absr = absr_sum / jnp.maximum(n_valid, 1.0)
            lam_learned = damping_fn(absr[None])[0]
            local_lam = lam * lam_learned
            if lam_depth is not None:
                local_lam_depth = lam_depth * lam_learned

        C = _damp(blocks.C, local_lam, cfg.diag_floor)
        Cinv_E = jnp.linalg.solve(C, blocks.E)
        Cinv_g = jnp.linalg.solve(C, blocks.g[..., None])[..., 0]

        # Local partial Schur terms; ONE fused psum of ~4 KB over the
        # frame axis (D: KxK, EC: KxK, h/Eg: K) rides ICI.
        D_loc = jnp.sum(blocks.D, axis=0)
        EC_loc = jnp.einsum("fpk,fpl->kl", blocks.E, Cinv_E)
        h_loc = jnp.sum(blocks.h, axis=0)
        Eg_loc = jnp.einsum("fpk,fp->k", blocks.E, Cinv_g)
        D_sum, EC, h, Eg = jax.lax.psum((D_loc, EC_loc, h_loc, Eg_loc),
                                        "frame")
        # Identical arithmetic to ba.window_ba.schur_solve: damp the
        # summed D, then subtract the Schur correction.
        D_t = _damp(D_sum, local_lam if local_lam_depth is None
                    else local_lam_depth, cfg.diag_floor) - EC
        h_t = h - Eg

        dW = -jnp.linalg.solve(D_t, h_t)  # replicated K x K solve
        dxi = -(Cinv_g + jnp.einsum("fpk,k->fp", Cinv_E, dW))
        Rn, tn = se3_update(Rs, ts, dxi)
        return Rn, tn, dW, blocks.residual

    fn = jax.shard_map(
        step_shard, mesh=mesh,
        in_specs=(P(), P("frame"), P(), P(), P(), P("frame"), P("frame"),
                  P(), P("frame")),
        out_specs=(P("frame"), P("frame"), P(), P("frame")),
    )
    Rn, tn, dW, res = fn(ref_feats, tgt_feats_grads, rays, init_depth,
                         basis, Rs, ts, W, frame_mask)
    return Rn, tn, W + dW, res
