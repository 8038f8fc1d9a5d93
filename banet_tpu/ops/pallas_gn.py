"""Fused Pallas TPU kernel: bilinear gather -> residual -> Gauss-Newton
normal equations, in one pass.

This is the TPU-native replacement for the reference's hot-op chain
(SURVEY.md §2.4 items 1-5): where the reference runs resampler +
grad-mask + ``EquationConstruction`` (CUDA, utils.cu:150-417) as
separate device ops with HBM round-trips between them, this kernel
keeps the big intermediates in VMEM:

  per point-tile (grid step):
    1. async-DMA each point's 2x2xF bilinear footprint from the padded
       feature map in HBM into VMEM scratch, pipelined with a window of
       outstanding copies (the map itself never streams through VMEM;
       tap indices arrive via scalar prefetch so the DMA offsets are
       scalar reads from SMEM — Mosaic cannot index VPU vectors);
    2. blend taps; split [f | df/dx | df/dy]; masked residual r and
       gradient G;
    3. form per-point M = G @ J (two VPU broadcasts; J rows precomputed
       by XLA — pointwise warp math is negligible and fuses there),
       then one MXU matmul per tile accumulates AtA += M^T M and
       Atb += M^T r, plus the damping-net statistics (sum |r| per
       channel, valid count).

HBM traffic: 16*F bytes per point (the 4 taps) + tiny outputs — the
speed-of-light minimum for a gather-based GN step.  The XLA path would
additionally materialize the sampled (N, 3C), the masked G/r, and the
per-point Gram intermediates in HBM between kernels.

Outputs accumulate across grid steps in the standard
revisit-the-same-block pattern (TPU grids execute sequentially).

The kernel covers the pose-only system (P = 6, padded to 8 lanes).
The bundle system (P = 6+K) keeps the XLA path: its per-point basis
rows make M wider but the same techniques apply (round-2 item).

Parity with the XLA path is tested in interpret mode on CPU
(tests/test_pallas_gn.py).

STATUS on the current toolchain: Mosaic rejects the per-point footprint
DMA ("Slice shape along dimension 1 must be aligned to tiling (8), but
is 2") — HBM sources keep a (8, 128)-tiled layout, so sub-8 sublane
slices are illegal and the legal workaround (16-row aligned overfetch
per tap pair) costs 8x the useful traffic.  Since the measured XLA
gather already sits at the bandwidth roofline for these shapes
(benchmarks/microbench.py "sampler"), the XLA path remains the default;
this kernel is kept as the interpret-mode-verified blueprint for
toolchains whose DMA engine accepts untiled HBM slices.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Points processed per grid step.
TILE = 128
# Outstanding DMA window (per-point footprint copies in flight).
DMA_WINDOW = 16


def _kernel(iy_ref, ix_ref, wxy_ref, jac_ref, ref_feats_ref, mask_ref,
            tgt_hbm, ata_ref, atb_ref, absr_ref, count_ref,
            foot_scratch, sems, *, C: int):
    """One point-tile.  F = 3C feature channels in tgt.

    iy_ref/ix_ref: (N,) int32 scalar-prefetch — padded-map block origins.
    wxy_ref: (TILE, 2) bilinear weights (wx, wy).
    jac_ref: (TILE, 16) [Ju | Jv] rows, 8 lanes each (cols 6, 7 zero).
    ref_feats_ref: (TILE, C); mask_ref: (TILE, 1).
    tgt_hbm: (H+4, W+4, 3C) in HBM/ANY.
    ata_ref: (8, 8) accumulated; atb_ref: (1, 8); absr_ref: (1, C);
    count_ref: (1, 1).
    foot_scratch: (TILE, 2, 2, 3C) VMEM; sems: (TILE,) DMA semaphores.
    """
    step = pl.program_id(0)
    base = step * TILE

    def copy_op(i):
        return pltpu.make_async_copy(
            tgt_hbm.at[pl.ds(iy_ref[base + i], 2),
                       pl.ds(ix_ref[base + i], 2), :],
            foot_scratch.at[i],
            sems.at[i],
        )

    for i in range(DMA_WINDOW):
        copy_op(i).start()

    def dma_loop(i, _):
        @pl.when(i + DMA_WINDOW < TILE)
        def _():
            copy_op(i + DMA_WINDOW).start()

        copy_op(i).wait()
        return 0

    jax.lax.fori_loop(0, TILE, dma_loop, 0)

    wx = wxy_ref[:, 0:1]                     # (T, 1)
    wy = wxy_ref[:, 1:2]
    foot = foot_scratch[:]                   # (T, 2, 2, 3C)
    top = foot[:, 0, 0, :] * (1 - wx) + foot[:, 0, 1, :] * wx
    bot = foot[:, 1, 0, :] * (1 - wx) + foot[:, 1, 1, :] * wx
    sampled = top * (1 - wy) + bot * wy      # (T, 3C)

    mask = mask_ref[:]                       # (T, 1)
    f = sampled[:, :C]
    gx = sampled[:, C:2 * C] * mask
    gy = sampled[:, 2 * C:3 * C] * mask
    r = (f - ref_feats_ref[:]) * mask        # (T, C)

    Ju = jac_ref[:, :8]                      # (T, 8)
    Jv = jac_ref[:, 8:]
    # M[t, c, p] = gx[t, c] Ju[t, p] + gy[t, c] Jv[t, p]
    M = (gx[:, :, None] * Ju[:, None, :] +
         gy[:, :, None] * Jv[:, None, :])    # (T, C, 8)
    M2 = M.reshape(TILE * C, 8)
    ata_tile = jnp.dot(M2.T, M2, preferred_element_type=jnp.float32)
    atb_tile = jnp.dot(r.reshape(1, TILE * C), M2,
                       preferred_element_type=jnp.float32)  # (1, 8)
    absr_tile = jnp.sum(jnp.abs(r), axis=0, keepdims=True)  # (1, C)
    count_tile = jnp.sum(mask).reshape(1, 1)

    @pl.when(step == 0)
    def _():
        ata_ref[:] = jnp.zeros_like(ata_ref)
        atb_ref[:] = jnp.zeros_like(atb_ref)
        absr_ref[:] = jnp.zeros_like(absr_ref)
        count_ref[:] = jnp.zeros_like(count_ref)

    ata_ref[:] += ata_tile
    atb_ref[:] += atb_tile
    absr_ref[:] += absr_tile
    count_ref[:] += count_tile


def _pose_normal_eq_single(tgt_padded, ref_feats, rays, depth, pose,
                           intr_vec, *, height: int, width: int,
                           interpret: bool):
    """Single-image call.  tgt_padded: (H+4, W+4, 3C) f32."""
    N, C = ref_feats.shape
    assert N % TILE == 0, (N, TILE)

    # ---- pointwise warp math in XLA (fuses into a few VPU kernels) ----
    R = pose[:, :3]
    t = pose[:, 3]
    fx, fy, cx, cy = (intr_vec[0, 0], intr_vec[0, 1], intr_vec[0, 2],
                      intr_vec[0, 3])
    Rp = rays @ R.T
    X = Rp * depth[:, None] + t[None, :]
    z_raw = X[:, 2]
    z = jnp.where(z_raw >= 0, jnp.maximum(z_raw, 1e-6),
                  jnp.minimum(z_raw, -1e-6))
    x = X[:, 0] / z
    y = X[:, 1] / z
    px = jnp.clip(fx * x + cx, -2.0, width + 1.0)
    py = jnp.clip(fy * y + cy, -2.0, height + 1.0)
    x0f = jnp.floor(px)
    y0f = jnp.floor(py)
    wxy = jnp.stack([px - x0f, py - y0f], axis=-1)          # (N, 2)
    ix = x0f.astype(jnp.int32) + 2
    iy = y0f.astype(jnp.int32) + 2
    mask = ((px >= 0) & (px <= width - 1) & (py >= 0) &
            (py <= height - 1)).astype(jnp.float32)[:, None]  # (N, 1)
    inv_z = 1.0 / z
    zeros = jnp.zeros_like(x)
    Ju = fx * jnp.stack([-x * y, 1 + x * x, -y, inv_z, zeros,
                         -x * inv_z, zeros, zeros], axis=-1)
    Jv = fy * jnp.stack([-1 - y * y, x * y, x, zeros, inv_z,
                         -y * inv_z, zeros, zeros], axis=-1)
    jac = jnp.concatenate([Ju, Jv], axis=-1)                # (N, 16)

    kernel = functools.partial(_kernel, C=C)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, 2), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),       # wxy
            pl.BlockSpec((TILE, 16), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),       # jac
            pl.BlockSpec((TILE, C), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),       # ref feats
            pl.BlockSpec((TILE, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),       # mask
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # tgt
        ],
        out_specs=(
            pl.BlockSpec((8, 8), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((TILE, 2, 2, 3 * C), jnp.float32),
            pltpu.SemaphoreType.DMA((TILE,)),
        ],
    )
    out_shapes = (
        jax.ShapeDtypeStruct((8, 8), jnp.float32),
        jax.ShapeDtypeStruct((1, 8), jnp.float32),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )
    ata, atb, absr, count = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(iy, ix, wxy, jac, ref_feats, mask, tgt_padded)
    return ata[:6, :6], atb[0, :6], absr[0], count[0, 0]


def pose_normal_equations_pallas(
        tgt_feats_grad: jnp.ndarray, ref_feats: jnp.ndarray,
        rays: jnp.ndarray, depth: jnp.ndarray, R: jnp.ndarray,
        t: jnp.ndarray, intr, interpret: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched fused pose GN assembly.

    Args match ba/residuals.warp_residuals: tgt_feats_grad (B, H, W, 3C)
    [f, gx, gy]; ref_feats (B, N, C); rays (B, N, 3); depth (B, N);
    R (B, 3, 3); t (B, 3); intr: geometry.camera.Intrinsics (B,).
    Returns (AtA (B, 6, 6), Atb (B, 6), abs_residual_sum (B, C),
    valid_count (B,)).
    """
    B, H, W, F = tgt_feats_grad.shape
    tgt_padded = jnp.pad(
        tgt_feats_grad.astype(jnp.float32),
        ((0, 0), (2, 2), (2, 2), (0, 0)))
    pose = jnp.concatenate([R, t[..., None]], axis=-1)  # (B, 3, 4)
    intr_vec = jnp.stack([intr.fx, intr.fy, intr.cx, intr.cy],
                         axis=-1)[:, None, :]           # (B, 1, 4)
    fn = functools.partial(_pose_normal_eq_single, height=H, width=W,
                           interpret=interpret)
    return jax.vmap(fn)(tgt_padded, ref_feats.astype(jnp.float32),
                        rays.astype(jnp.float32),
                        depth.astype(jnp.float32), pose,
                        intr_vec.astype(jnp.float32))
