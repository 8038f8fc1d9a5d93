"""Distributed multi-keyframe window BA: frame-sharded observation
blocks, ONE fused psum, replicated reduced solve.

Extends parallel/window_ba.py's pattern to the multi-keyframe solver
(ba/multi_window_ba.py), preserving the communication invariant: the
per-(keyframe, frame) normal-equation blocks — the heavy part, N points
x C channels per pair — are computed on the device that owns the frame;
the only cross-device traffic is one fused psum of the assembled dense
partials (H (P, P), g (P,), U (M, P, K), D (M, K, K), h (M, K), plus
two damping scalars), whose size depends on the window (P = 6F+6(M-1)),
NOT on the mesh — O(1) collectives of O(window) payload (~30 KB at
F=8, M=2, K=32).

Gauge consistency across shards: keyframe 0 is pinned (never a
variable) and the reduced solve runs replicated on psum'd — hence
bit-identical — inputs, so every shard applies the same keyframe-pose
and basis updates; only the frame-pose extraction is shard-local.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from banet_tpu.ba.multi_window_ba import (MultiWindowProblem,
                                          assemble_dense, pair_blocks,
                                          solve_reduced)
from banet_tpu.config import SolverConfig
from banet_tpu.geometry.camera import Intrinsics
from banet_tpu.geometry.se3 import se3_update


def sharded_multi_window_ba_step(mesh: Mesh, prob: MultiWindowProblem,
                                 Rs_f, ts_f, Rs_k, ts_k, Ws,
                                 intr: Intrinsics, lam: float,
                                 cfg: SolverConfig,
                                 lam_depth: float = None,
                                 damping_fn=None):
    """One multi-keyframe GN step with frames sharded over axis "frame".

    Same semantics as ba.multi_window_ba.multi_window_ba_step; the full
    window arrays come in unsharded and shard_map decomposes the
    frame-indexed ones (tgt_fg, frame poses, obs_mask columns).  F must
    be divisible by the frame-axis size.
    """
    if lam_depth is None:
        lam_depth = lam
    M = prob.ref_feats.shape[0]
    F = prob.tgt_fg.shape[0]
    n_shards = mesh.shape["frame"]
    F_loc = F // n_shards

    def shard(ref_feats, rays, init_depth, basis, obs_mask_loc,
              tgt_fg_loc, Rf_loc, tf_loc, Rk, tk, Ws):
        fo = jax.lax.axis_index("frame") * F_loc

        def one_pair(m, f):
            return pair_blocks(
                ref_feats[m], rays[m], init_depth[m], basis[m], Ws[m],
                tgt_fg_loc[f], Rf_loc[f], tf_loc[f], Rk[m], tk[m], intr,
                obs_mask_loc[m, f])

        blocks = jax.vmap(lambda m: jax.vmap(
            lambda f: one_pair(m, f))(jnp.arange(F_loc)))(jnp.arange(M))

        H, g, U, D, h = assemble_dense(blocks, F_loc, M,
                                       frame_offset=fo, total_frames=F)
        absr_loc = jnp.sum(blocks.absr, axis=(0, 1))
        cnt_loc = jnp.sum(blocks.count)
        # ONE fused psum: the whole reduced system + damping stats.
        H, g, U, D, h, absr, cnt = jax.lax.psum(
            (H, g, U, D, h, absr_loc, cnt_loc), "frame")

        local_lam = lam
        local_lam_depth = lam_depth
        if damping_fn is not None:
            avg_r = (absr / jnp.maximum(cnt, 1.0))[None]
            lam_learned = damping_fn(avg_r)[0]
            local_lam = lam * lam_learned
            local_lam_depth = lam_depth * lam_learned

        dxi_f, dxi_k, dW = solve_reduced(H, g, U, D, h, F, M, local_lam,
                                         local_lam_depth, cfg.diag_floor)
        # Extract this shard's frame updates; keyframe/basis updates are
        # replicated (identical on every shard).
        dxi_loc = jax.lax.dynamic_slice(dxi_f, (fo, 0), (F_loc, 6))
        Rf_new, tf_new = se3_update(Rf_loc, tf_loc, dxi_loc)
        Rk_new, tk_new = se3_update(Rk, tk, dxi_k)
        Rk_new = Rk.at[1:].set(Rk_new[1:])
        tk_new = tk.at[1:].set(tk_new[1:])
        res = jnp.sum(absr) / jnp.maximum(cnt * absr.shape[-1], 1.0)
        return Rf_new, tf_new, Rk_new, tk_new, Ws + dW, res

    fn = jax.shard_map(
        shard, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(None, "frame"), P("frame"),
                  P("frame"), P("frame"), P(), P(), P()),
        out_specs=(P("frame"), P("frame"), P(), P(), P(), P()),
    )
    return fn(prob.ref_feats, prob.rays, prob.init_depth, prob.basis,
              prob.obs_mask, prob.tgt_fg, Rs_f, ts_f, Rs_k, ts_k, Ws)
