"""Central-difference spatial gradients of feature maps.

Equivalent of reference ``BundleNet.grad_fixed`` (bundlenet.py:92-100,
same code at legacy/ba.py:17-25): REFLECT-padded central differences,
0.5 * (f[x+1] - f[x-1]), concatenated as [gradx, grady] on the channel
axis.  The GN layer samples these precomputed gradient channels at the
warped points instead of differentiating the interpolant — exactly the
reference's design, and the right one for TPU too (the gradient maps are
computed once per level as cheap VPU shifts, then ride along in the same
gather as the features).
"""

from __future__ import annotations

import jax.numpy as jnp


def spatial_gradient(f: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W, 2C): central diffs, REFLECT padding.

    Channel layout [d/dx, d/dy] to match reference bundlenet.py:98-100.
    """
    p = jnp.pad(f, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    H, W = f.shape[1], f.shape[2]
    gx = 0.5 * (p[:, 1:H + 1, 2:W + 2, :] - p[:, 1:H + 1, 0:W, :])
    gy = 0.5 * (p[:, 2:H + 2, 1:W + 1, :] - p[:, 0:H, 1:W + 1, :])
    return jnp.concatenate([gx, gy], axis=-1)


def append_spatial_gradient(f: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W, 3C): [f, gradx, grady].

    The target-view feature map fed to the GN iterations (reference
    bundlenet.py:323-324: layer2 = concat([layer2, grad_fixed(layer2)])).
    """
    return jnp.concatenate([f, spatial_gradient(f)], axis=-1)
