"""Fixed-kernel 2x bilinear upsampling.

Equivalent of the reference's fixed 4x4 bilinear transposed depthwise
convolution (reference dec.py:23-35/49-61 and legacy/feat.py:213-231):
SYMMETRIC-pad by 1, stride-2 transposed depthwise conv with the kernel
  outer([1, 3, 3, 1]/4, [1, 3, 3, 1]/4)
then crop 2 pixels per side.  The reference also registers a custom TF
gradient for the backprop-input op (dec.py:6-21); in JAX the transposed
conv is a first-class primitive and differentiates natively.

On TPU we express it with ``jax.lax.conv_transpose`` using a
feature-group-count depthwise layout, NHWC.  The kernel is a constant —
never trained in the current decoder (the legacy pyramid made it
trainable, feat.py:224; we keep it fixed like dec.py, and the learned
pyramid convs absorb any difference).
"""

from __future__ import annotations

import jax.lax as lax
import jax.numpy as jnp
import numpy as np

_KERNEL_1D = np.array([1.0, 3.0, 3.0, 1.0]) / 4.0
_KERNEL_2D = np.outer(_KERNEL_1D, _KERNEL_1D)  # matches dec.py:24-27 values


def upsample2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, 2H, 2W, C) fixed bilinear upsampling.

    Matches the reference construction exactly: symmetric pad 1, 4x4
    stride-2 depthwise conv_transpose with 'SAME' padding (output
    2*(H+2) = 2H+4), crop 2 per side (reference dec.py:32-35).
    """
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
