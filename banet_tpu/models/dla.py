"""DLA-style depth + depth-basis decoder, Flax/NHWC.

Re-design of the reference decoder (reference dec.py:37-155
``DLA.depth_basis``): iterative deep aggregation over a triangle of
nodes.  The top row seeds from the backbone (finest = layer2 at 1/2
resolution through coarsest = layer6 at 1/32); every node fuses a finer
input with a projected + upsampled coarser input:

  node(level, scale):
    a = layer_{level+1}_{scale}            (finer, kept resolution)
    b = layer_{level+1}_{scale+1}          (coarser)
    b = relu(BN(conv1x1(b -> channels(a))))   (dec.py:151-155)
    b = upsample2x_bilinear(b)                (fixed kernel, dec.py:49-61)
    layer_{level}_{scale} = relu(BN(conv1x1(concat[a, b])))  (dec.py:63-68)

After 4 aggregation levels the apex ``layer_0_0`` (1/2 resolution,
finest-row channel count = 32 with default DRN channels) feeds two
heads (dec.py:104-108):

  depth = relu(conv1x1 + bias)                      (B, H/2, W/2, 1)
  basis = layer_0_0 * rsqrt(var_{H,W} + 1e-3)       (B, H/2, W/2, K=32)

``normalize_basis=False`` reproduces the ``depth_basis_bundle`` variant
that skips the instance-std normalization (dec.py:112-149).
"""

from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from banet_tpu.models.drn import ConvBN
from banet_tpu.ops.upsample import upsample2x_bilinear


class DLA(nn.Module):
    """Depth-basis decoder over 5 backbone scales."""

    normalize_basis: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, backbone_layers: List[jnp.ndarray],
                 train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """backbone_layers: [layer6 (1/32) ... layer2 (1/2)] (the first
        five DRN outputs, coarse -> fine; reference dec.py:75-77 maps
        layers[6-l] into the top row).  Returns (depth, basis)."""
        assert len(backbone_layers) >= 5
        # Top row, finest first: layer_4_0 = layer2 ... layer_4_4 = layer6.
        row = list(reversed(backbone_layers[:5]))
        for level in range(3, -1, -1):
            new_row = []
            for scale in range(level + 1):
                a = row[scale]
                b = row[scale + 1]
                b = ConvBN(a.shape[-1], kernel=1, dtype=self.dtype,
                           name=f"proj_{level}_{scale}")(b, train)
                b = nn.relu(b)
                b = upsample2x_bilinear(b)
                ab = jnp.concatenate([a, b], axis=-1)
                node = ConvBN(a.shape[-1], kernel=1, act=nn.relu,
                              dtype=self.dtype,
                              name=f"agg_{level}_{scale}")(ab, train)
                new_row.append(node)
            row = new_row
        apex = row[0]  # layer_0_0

        depth = nn.Conv(1, (1, 1), use_bias=True, dtype=self.dtype,
                        kernel_init=nn.initializers.he_normal(),
                        name="depth_head")(apex)
        depth = nn.relu(depth).astype(jnp.float32)

        apex32 = apex.astype(jnp.float32)
        if self.normalize_basis:
            var = jnp.var(apex32, axis=(1, 2), keepdims=True)
            basis = apex32 * jax.lax.rsqrt(var + 1e-3)
        else:
            basis = apex32
        return depth, basis
