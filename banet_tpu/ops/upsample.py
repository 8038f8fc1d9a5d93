"""Fixed-kernel 2x bilinear upsampling.

Equivalent of the reference's fixed 4x4 bilinear transposed depthwise
convolution (reference dec.py:23-35/49-61 and legacy/feat.py:213-231):
SYMMETRIC-pad by 1, stride-2 transposed depthwise conv with the kernel
  outer([1, 3, 3, 1]/4, [1, 3, 3, 1]/4)
then crop 2 pixels per side.  The reference also registers a custom TF
gradient for the backprop-input op (dec.py:6-21); in JAX both
formulations below differentiate natively.

TPU formulation: the kernel is separable and fixed, so instead of a
depthwise ``conv_general_dilated`` with ``lhs_dilation=2`` — a
worst-case conv for the TPU backend (depthwise keeps it off the MXU,
input dilation forces a slow path; on-chip comparison in
artifacts/PROFILE_r02/) — each axis is upsampled by
interleaving two shifted weighted averages:

  out[2m]   = (3*xp[m] + xp[m+1]) / 4
  out[2m+1] = (xp[m] + 3*xp[m+1]) / 4

which XLA lowers to a handful of fused elementwise ops + a reshape
(bandwidth-bound, exact same values; parity vs the conv formulation is
asserted in tests/test_ops.py).  ``upsample2x_bilinear_conv`` keeps the
literal conv construction as the reference semantics oracle.
"""

from __future__ import annotations

import jax.lax as lax
import jax.numpy as jnp
import numpy as np

_KERNEL_1D = np.array([1.0, 3.0, 3.0, 1.0]) / 4.0
_KERNEL_2D = np.outer(_KERNEL_1D, _KERNEL_1D)  # matches dec.py:24-27 values


def _up_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """2x upsample along ``axis``: symmetric pad 1, [1,3,3,1]/4
    stride-2 transposed kernel, crop — expressed as interleaved
    weighted averages of adjacent samples."""
    edge_lo = lax.slice_in_dim(x, 0, 1, axis=axis)
    edge_hi = lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis],
                               axis=axis)
    xp = jnp.concatenate([edge_lo, x, edge_hi], axis=axis)
    n = xp.shape[axis]
    a = lax.slice_in_dim(xp, 0, n - 1, axis=axis)
    b = lax.slice_in_dim(xp, 1, n, axis=axis)
    four = jnp.asarray(4.0, x.dtype)
    three = jnp.asarray(3.0, x.dtype)
    even = (three * a + b) / four
    odd = (a + three * b) / four
    st = jnp.stack([even, odd], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] = 2 * (n - 1)
    inter = st.reshape(shape)
    return lax.slice_in_dim(inter, 1, 2 * (n - 1) - 1, axis=axis)


def upsample2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, 2H, 2W, C) fixed bilinear upsampling.

    Values match the reference construction exactly (symmetric pad 1,
    4x4 stride-2 depthwise conv_transpose, crop 2 per side — reference
    dec.py:32-35); see module docstring for why it is not a conv here.
    """
    return _up_axis(_up_axis(x, 1), 2)


def upsample2x_bilinear_conv(x: jnp.ndarray) -> jnp.ndarray:
    """Literal conv construction (reference semantics oracle; the
    production path is the separable interleave above)."""
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="symmetric")
    k = jnp.asarray(_KERNEL_2D, dtype=x.dtype)
    # Depthwise kernel: (kh, kw, in_per_group=1, C).
    kern = jnp.tile(k[:, :, None, None], (1, 1, 1, C))
    # Transposed stride-2 conv expressed as an lhs-dilated conv: input
    # dilation 2, pad (k-1-1)=2 per side -> output 2*(H+2); the 4x4
    # bilinear kernel is symmetric so no explicit flip is needed.
    out = lax.conv_general_dilated(
        xp, kern, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )
    return out[:, 2:-2, 2:-2, :]
