"""Space-to-depth rewrite of the DRN stem (layer0 7x7 + layer1 3x3).

The reference stem (reference enc.py:168-192: a 7x7 conv and a 3x3 conv
at FULL resolution with 16 output channels) is the worst conv shape for
the TPU: 16 output channels use 16 of the MXU's 128 output lanes
(12.5%), and the (H, W, 16) bf16 intermediate is lane-padded 16 -> 128,
so every HBM traversal of it moves 8x the useful bytes.

This module computes the SAME function on the 2x2 space-to-depth grid:

  layer0: 7x7 s1 conv on (H, W, 3)  ==  4x4 conv on (H/2, W/2, 12)
          producing all 4 output phases as 4x16 = 64 lanes, provided
          the input is pre-padded by 3 in the original domain (then
          every phase's taps fall in a common 4x4 block window);
  layer1: 3x3 s1 conv on (H, W, 16) ==  3x3 conv on (H/2, W/2, 64),
          with the 1-px original-domain SYMMETRIC padding realized as a
          one-block phase-swapped edge copy (mirroring rows (-2, -1) to
          (1, 0) swaps the row phase of the edge block);
  the avg-pool-2 that follows layer1 is exactly the mean over the 4
  phase channels, so the s2d domain ends at the stage boundary.

Output-lane use rises 12.5% -> 50% and intermediate lane padding drops
8x -> 2x.  The rewrite is numerically the same map (kernels are
re-indexed views of the standard (7,7,3,16)/(3,3,16,16) parameters with
structural zeros), so it is a pure inference-layout knob: checkpoints
trained with the standard stem load unchanged — the parameter tree the
holder modules declare is identical to the standard ConvBN path's
(params/layer{0,1_0}/{Conv_0/kernel, BatchNorm_0/{scale,bias}} +
batch_stats/.../{mean,var}).

Training-mode BatchNorm would need per-phase batch statistics, which
are NOT the standard stem's statistics — the knob therefore refuses
``train=True``; train with the standard stem, track with this one.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

_DIMS = ("NHWC", "HWIO", "NHWC")


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel order (pi, pj, c)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    B, Hb, Wb, C4 = x.shape
    C = C4 // 4
    x = x.reshape(B, Hb, Wb, 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * Hb, 2 * Wb, C)


def _phase_gathered_kernel(k: jnp.ndarray, taps: int,
                           dy_of: Any) -> jnp.ndarray:
    """Re-index a (K, K, Cin, Co) stride-1 kernel into the s2d-domain
    (taps, taps, 4*Cin, 4*Co) kernel.

    ``dy_of(db, p_in, p_out)`` maps a block tap + input/output phase to
    the original kernel row (or column — the kernel is separable in its
    index math), returning an out-of-range value for structural zeros.
    """
    K = k.shape[0]
    # Zero-extend by one row/col; out-of-range indices map to it.
    kp = jnp.pad(k, ((0, 1), (0, 1), (0, 0), (0, 0)))
    idx = []
    for db in range(taps):
        for p_in in range(2):
            for p_out in range(2):
                dy = dy_of(db, p_in, p_out)
                idx.append(dy if 0 <= dy < K else K)
    iy = jnp.asarray(idx, jnp.int32).reshape(taps, 2, 2)
    t = kp[iy]            # (taps, 2, 2pi_o, K+1, Cin, Co) rows gathered
    t = t[:, :, :, iy]    # (tap_i, pi, po_i, tap_j, pj, po_j, Cin, Co)
    # -> (tap_i, tap_j, pi, pj, Cin, po_i, po_j, Co)
    t = t.transpose(0, 3, 1, 4, 6, 2, 5, 7)
    taps_i, taps_j = t.shape[0], t.shape[1]
    Cin, Co = k.shape[2], k.shape[3]
    return t.reshape(taps_i, taps_j, 4 * Cin, 4 * Co)


def s2d_kernel_7x7(k: jnp.ndarray) -> jnp.ndarray:
    """(7,7,Cin,Co) -> (4,4,4Cin,4Co) for an input pre-padded by 3 in
    the ORIGINAL domain before space_to_depth: output phase po at block
    i reads padded rows 2i+po+dy, tap (db, pi) supplies padded row
    2(i+db)+pi, hence dy = 2*db + pi - po."""
    return _phase_gathered_kernel(k, 4, lambda db, pi, po: 2 * db + pi - po)


def s2d_kernel_3x3(k: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Cin,Co) -> (3,3,4Cin,4Co) for an s2d input pre-padded by
    ONE BLOCK: tap (db, pi) supplies original row 2(i+db-1)+pi, output
    row 2i+po reads rows 2i+po-1+dy, hence dy = 2*db + pi - 1 - po."""
    return _phase_gathered_kernel(k, 3,
                                  lambda db, pi, po: 2 * db + pi - 1 - po)


def pad_one_block(y: jnp.ndarray, pad_mode: str) -> jnp.ndarray:
    """Pad an s2d tensor by one block on each side, equivalent to 1-px
    padding in the original domain: symmetric mirroring maps original
    rows (-2, -1) to (1, 0) = the edge block with its row phase swapped
    (and likewise for columns); zero padding is a zero block."""
    if pad_mode == "zero":
        return jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # symmetric_fast is the border-corrected SAME-conv formulation of
    # the same function (drn._FastSymConv3x3); in the s2d domain the
    # explicit mirrored block is the natural form either way.
    assert pad_mode in ("symmetric", "symmetric_fast"), pad_mode
    B, Hb, Wb, C4 = y.shape
    C = C4 // 4
    yy = y.reshape(B, Hb, Wb, 2, 2, C)
    yy = jnp.concatenate([yy[:, :1, :, ::-1], yy, yy[:, -1:, :, ::-1]],
                         axis=1)
    yy = jnp.concatenate(
        [yy[:, :, :1, :, ::-1], yy, yy[:, :, -1:, :, ::-1]], axis=2)
    return yy.reshape(B, Hb + 2, Wb + 2, C4)


class _KernelParam(nn.Module):
    """Declares ``kernel`` exactly as the nn.Conv inside ConvBN does."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.he_normal(), self.shape)


class _BNParams(nn.Module):
    """Declares scale/bias (+ running mean/var) exactly as nn.BatchNorm
    does, without computing anything."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.features,), jnp.float32))
        return scale, bias, mean.value, var.value


class _ConvBNParams(nn.Module):
    """Parameter tree mirror of drn.ConvBN (conv kernel + BN), named so
    a checkpoint trained with the standard stem restores verbatim."""

    kernel: int
    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self):
        k = _KernelParam((self.kernel, self.kernel, self.in_ch,
                          self.out_ch), name="Conv_0")()
        bn = _BNParams(self.out_ch, name="BatchNorm_0")()
        return k, bn


def stem_s2d(x: jnp.ndarray, k0, bn0, k1, bn1, pad_mode: str, dtype,
             bn_eps: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compute layer0 + layer1 + avg-pool-2 in the s2d domain.

    Pure function: the caller (DRN with ``stem_s2d=True``) declares the
    standard-layout parameters via :class:`_ConvBNParams` and passes
    them here.

    Args:
      x: (B, H, W, 3) normalized image, already cast to ``dtype``;
        H and W must be even.
      k0/bn0: layer0's (7,7,3,ch0) kernel and (scale, bias, mean, var).
      k1/bn1: layer1's (3,3,ch0,ch0) kernel and BN tuple.

    Returns (layer1_fullres, pooled): the (B, H, W, ch0) layer1 output
    (the pyramid's full-res skip) and the (B, H/2, W/2, ch0) pooled map
    that feeds layer2.
    """
    ch0 = k0.shape[-1]
    mode = ("symmetric" if pad_mode in ("symmetric", "symmetric_fast")
            else "constant")
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode=mode)
    xs = space_to_depth(xp)
    y = lax.conv_general_dilated(xs, s2d_kernel_7x7(k0).astype(dtype),
                                 (1, 1), "VALID", dimension_numbers=_DIMS)
    y = _bn_relu(y, bn0, bn_eps, dtype)

    yp = pad_one_block(y, pad_mode)
    z = lax.conv_general_dilated(yp, s2d_kernel_3x3(k1).astype(dtype),
                                 (1, 1), "VALID", dimension_numbers=_DIMS)
    z = _bn_relu(z, bn1, bn_eps, dtype)

    layer1 = depth_to_space(z)
    B, Hb, Wb, _ = z.shape
    pooled = z.reshape(B, Hb, Wb, 4, ch0).mean(axis=3)
    return layer1, pooled


def _bn_relu(y: jnp.ndarray, bn, eps: float, dtype) -> jnp.ndarray:
    """Inference BatchNorm + relu on an s2d tensor: per-channel stats
    tile over the 4 phase copies.  Matches flax _normalize's op order
    ((x - mean) * (rsqrt(var + eps) * scale) + bias) in ``dtype``."""
    scale, bias, mean, var = bn
    mul = lax.rsqrt(var.astype(dtype) + jnp.asarray(eps, dtype))
    mul = mul * scale.astype(dtype)
    y = (y - jnp.tile(mean.astype(dtype), 4)) * jnp.tile(mul, 4)
    return nn.relu(y + jnp.tile(bias.astype(dtype), 4))
