"""Top-down feature pyramid producing matching-ready 128-ch maps.

Re-design of the reference feature pyramids.  The reference has two:
the working 3-level legacy one (reference legacy/feat.py:202-271) and a
4-level one in dec.py that was pasted from it and never ran (reference
dec.py:157-196 calls an ``upsample`` with the wrong arity and an
undefined ``batch_norm_selu`` — SURVEY.md §7 bug catalog).  This module
implements what both intend, parameterized by level count:

  per output level (top-down):
    up  = upsample2x_bilinear(previous pyramid level)
    agg = relu(BN(conv1x1(concat[up, skip])))     # "aggregation"
    out = selu(BN(conv3x3(agg))) -> 128 channels  # "batch_norm_selu"

- 4 levels (flagship, dec.py intent): outputs at 1/8, 1/4, 1/2, 1/1,
  seeded from layer5 (1/16), skips layer4..layer1;
- 3 levels (legacy tracker, feat.py:240-271): outputs at 1/4, 1/2, 1/1,
  seeded from layer4 (1/8), skips layer3..layer1 (the legacy version
  stacks two 3x3 convs per level; ``convs_per_level=2`` reproduces it).

The fixed bilinear upsampling kernel is the same 4x4 one as the decoder
(ops/upsample.py; the legacy pyramid made it trainable, feat.py:224 —
kept fixed here, the surrounding convs absorb the difference).

Output order: coarse -> fine, matching the solver's level order.
"""

from __future__ import annotations

from typing import Any, List

import flax.linen as nn
import jax.lax as lax
import jax.numpy as jnp

from banet_tpu.models.drn import ConvBN
from banet_tpu.ops.upsample import upsample2x_bilinear


class _Kernel1x1(nn.Module):
    """Declares ``kernel`` exactly as the nn.Conv inside ConvBN does
    (he-normal, HWIO) so checkpoints restore verbatim."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.he_normal(),
                          self.shape)


class _FoldedAgg(nn.Module):
    """The pyramid aggregation node computed in folded form.

    Faithful form (ConvBN agg): relu(BN(conv1x1(concat[up(x), skip]))).
    The fixed bilinear upsampler is per-channel linear with coefficients
    shared across channels, so it COMMUTES with the 1x1 channel mix:
    conv1x1(up(x), Wx) == up(conv1x1(x, Wx)) exactly.  Splitting the
    concat kernel W = [Wx | Ws] therefore gives

        relu(BN(up(conv1x1(x, Wx)) + conv1x1(skip, Ws)))

    — the same function, but (a) the up-path 1x1 contraction runs at
    COARSE resolution (4x fewer pixels), and (b) the wide full-res
    concat map (e.g. 144 ch at 256x320) never materializes in HBM.
    The single (1, 1, Cx+Cs, F) kernel parameter and the BatchNorm live
    at the very names ConvBN would give them ("Conv_0"/"BatchNorm_0"),
    so existing checkpoints load unchanged (VERDICT r3 item 5: fold the
    upsample + blends into the conv calls).
    """

    features: int
    dtype: Any = jnp.bfloat16
    bn_momentum: float = 0.95
    bn_epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x_coarse, skip, train: bool = False):
        Cx = x_coarse.shape[-1]
        Cs = skip.shape[-1]
        kernel = _Kernel1x1((1, 1, Cx + Cs, self.features),
                            name="Conv_0")()
        k = kernel.astype(self.dtype)
        dn = ("NHWC", "HWIO", "NHWC")

        def c1x1(inp, kk):
            return lax.conv_general_dilated(
                inp.astype(self.dtype), kk, (1, 1), "VALID",
                dimension_numbers=dn)

        y = (upsample2x_bilinear(c1x1(x_coarse, k[:, :, :Cx]))
             + c1x1(skip, k[:, :, Cx:]))
        y = nn.BatchNorm(use_running_average=not train,
                         momentum=self.bn_momentum,
                         epsilon=self.bn_epsilon, dtype=self.dtype,
                         name="BatchNorm_0")(y)
        return nn.relu(y)


class FeaturePyramid(nn.Module):
    """``agg_features``/``finest_convs`` are the TPU-first knobs: the
    faithful structure (None/None) 1x1-aggregates at the CONCAT width
    (144 at the finest level — pads 144 -> 256 on the MXU's 128-lane
    contraction) and runs ``convs_per_level`` 3x3 convs at EVERY level
    including full resolution, where one 144->128 3x3 conv at 256x320
    costs 27 GFLOPs — half the entire tracking frame's FLOP budget.
    Setting ``agg_features=128`` aligns every matmul to the MXU tile
    and ``finest_convs=0`` merges the full-res level with the 1x1
    aggregation only (the upsampled path provides context, the stem
    skip provides full-res detail; the fixed bilinear upsampler is
    smooth, so no de-aliasing conv is needed) — 44 -> 12 GFLOPs for
    the pyramid at identical level count/scales/output channels."""

    levels: int = 4
    features: int = 128
    convs_per_level: int = 1
    agg_features: int | None = None   # None -> concat width (faithful)
    finest_convs: int | None = None   # None -> convs_per_level
    dtype: Any = jnp.bfloat16
    pad_mode: str = "symmetric"       # see drn.ConvBN.pad_mode
    fold_agg: bool = False            # _FoldedAgg (same function/params)

    @nn.compact
    def __call__(self, backbone_layers: List[jnp.ndarray],
                 train: bool = False) -> List[jnp.ndarray]:
        """backbone_layers: [layer6, layer5, layer4, layer3, layer2,
        layer1] coarse -> fine (drn38 output; drn22/54 callers must
        include a full-res map last).  Returns ``levels`` maps
        coarse -> fine, each ``features`` channels."""
        assert len(backbone_layers) >= self.levels + 1
        # Skips for the output levels, coarse -> fine; the seed is one
        # coarser than the first output.
        skips = backbone_layers[-self.levels:]
        x = backbone_layers[-self.levels - 1]
        outs = []
        for lvl, skip in enumerate(skips):
            if self.fold_agg:
                agg_ch = self.agg_features or (x.shape[-1]
                                               + skip.shape[-1])
                x = _FoldedAgg(agg_ch, dtype=self.dtype,
                               name=f"agg_{lvl}")(x, skip, train)
            else:
                x = upsample2x_bilinear(x)
                x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
                agg_ch = self.agg_features or x.shape[-1]
                x = ConvBN(agg_ch, kernel=1, act=nn.relu,
                           dtype=self.dtype, name=f"agg_{lvl}")(x, train)
            n_convs = self.convs_per_level
            if lvl == self.levels - 1 and self.finest_convs is not None:
                n_convs = self.finest_convs
            for c in range(n_convs):
                x = ConvBN(self.features, kernel=3, act=nn.selu,
                           dtype=self.dtype, pad_mode=self.pad_mode,
                           name=f"conv_{lvl}_{c}")(x, train)
            if x.shape[-1] != self.features:
                # finest_convs=0 with agg width != features: keep the
                # contract that every output level has ``features`` ch.
                x = ConvBN(self.features, kernel=1, act=nn.selu,
                           dtype=self.dtype,
                           name=f"proj_{lvl}")(x, train)
            outs.append(x)
        return outs
