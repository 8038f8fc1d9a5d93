"""Dilated Residual Network encoder (DRN-22 / 38 / 54), Flax/NHWC.

Re-design of the reference encoder (reference enc.py:142-239), keeping
the architectural decisions that affect parity:

- SYMMETRIC (edge-reflecting) padding before every k>1 conv instead of
  zero padding (reference enc.py:23-41 — "zero padding is stupid");
- stride-2 realized as 2x2 average pooling *before* each stage's block
  stack, with stride-1 convs inside (reference enc.py:160-161,172-173);
- projection shortcuts (1x1 conv + BN) whenever channels change
  (reference enc.py:43-47);
- inline ImageNet input normalization: x/255 then (x-mean)/std
  (reference enc.py:185, which passes variance=std^2 to TF batch_norm);
- BN momentum 0.95, eps 1e-5 (reference enc.py:5-6);
- stage plan: layer0 = 7x7 conv; layers 1-2 = plain conv stacks;
  layers 3-6 = residual stages with channels (16,16,32,64,128,256,512)
  x block expansion (reference enc.py:145,180-239).

TPU adaptations: NHWC layout (channel = lane dimension), bfloat16
compute with float32 params/statistics, explicit he-normal init.  All
"no_dilation" variants (the only ones the reference instantiates) are
covered; dilation plumbing exists on ConvBlock for completeness.

Variants (reference enc.py:180,201,221):
  drn22: basic blocks,      stage depths [1, 1, 2, 2, 2, 2]
  drn38: basic blocks,      stage depths [1, 1, 3, 4, 6, 3]
  drn54: bottleneck blocks, stage depths [1, 1, 3, 4, 6, 3]

Output: list of feature maps [layer6 (1/32), layer5 (1/16),
layer4 (1/8), layer3 (1/4), layer2 (1/2)] (+ layer1 (1/1) when
``include_layer1``, which drn38 returns in the reference,
enc.py:219).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from banet_tpu.models.stem_s2d import _ConvBNParams, stem_s2d

_VARIANTS = {
    "drn22": ("basic", (1, 1, 2, 2, 2, 2)),
    "drn38": ("basic", (1, 1, 3, 4, 6, 3)),
    "drn54": ("bottleneck", (1, 1, 3, 4, 6, 3)),
}


def symmetric_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """NHWC symmetric (edge-inclusive mirror) spatial padding
    (reference enc.py:23-29)."""
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                   mode="symmetric")


class _FastSymConv3x3(nn.Module):
    """EXACT symmetric-pad 3x3 conv without the padded-map copy.

    ``symmetric_pad`` materializes an (H+2, W+2, C) concat that XLA
    cannot fold into the convolution — a full extra HBM round trip per
    conv (the measured cost of the reference-parity pad mode).  The
    identity used here: a symmetric-padded VALID conv equals the
    SAME-zero conv everywhere except the 1-px border, and the border
    difference is exactly the contribution of the mirrored pad frame.
    Partitioning that frame into the top/bottom pad ROWS (spanning the
    corners) and left/right pad COLUMNS (corners excluded):

      top   row y=-1  = row 0 mirrored in x  -> conv1x3(sympad_x(row0),
                                                        k[0, :])
      bottom row y=H  = row H-1 mirrored     -> conv1x3(..., k[2, :])
      left  col x=-1 (y in 0..H-1) = col 0   -> conv3x1(zpad_y(col0),
                                                        k[:, 0])
      right col x=W  likewise                -> conv3x1(..., k[:, 2])

    added to the border rows/cols of the SAME-zero conv (the zero pad
    folds into the conv; the four 1-px-strip convs are O(H+W) work and
    the adds fuse into the following BN/activation).  Numerically
    identical to symmetric_pad+VALID up to f32 reassociation — the
    parity test asserts ~1e-6 agreement, so symmetric-trained
    checkpoints run unchanged.

    Parameter layout matches ``nn.Conv`` (kernel (3, 3, Cin, Cout)
    HWIO, he-normal) so it can be named "Conv_0" inside ConvBN and
    restore any existing checkpoint verbatim.
    """

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        import jax.lax as lax

        C = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            (3, 3, C, self.features))
        k = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        dn = ("NHWC", "HWIO", "NHWC")

        def conv(inp, kk, padding):
            return lax.conv_general_dilated(
                inp, kk, (1, 1), padding, dimension_numbers=dn)

        y = conv(x, k, "SAME")
        H, W = x.shape[1], x.shape[2]
        # Border corrections (see class docstring).
        row0 = x[:, 0:1]
        rowh = x[:, H - 1:H]

        def sympad_x(row):
            return jnp.concatenate(
                [row[:, :, 0:1], row, row[:, :, W - 1:W]], axis=2)

        d_top = conv(sympad_x(row0), k[0:1], "VALID")
        d_bot = conv(sympad_x(rowh), k[2:3], "VALID")
        col0 = x[:, :, 0:1]
        colw = x[:, :, W - 1:W]

        def zpad_y(col):
            return jnp.pad(col, ((0, 0), (1, 1), (0, 0), (0, 0)))

        d_left = conv(zpad_y(col0), k[:, 0:1], "VALID")
        d_right = conv(zpad_y(colw), k[:, 2:3], "VALID")
        z = ((0, 0), (0, 0))
        y = (y
             + jnp.pad(d_top, ((0, 0), (0, H - 1)) + z)
             + jnp.pad(d_bot, ((0, 0), (H - 1, 0)) + z)
             + jnp.pad(d_left, ((0, 0), (0, 0), (0, W - 1), (0, 0)))
             + jnp.pad(d_right, ((0, 0), (0, 0), (W - 1, 0), (0, 0))))
        return y


class ConvBN(nn.Module):
    """Padded conv + optional BN + optional activation.

    ``pad_mode``: "symmetric" (reference parity, enc.py:23-41) mirrors
    the edge before a VALID conv — an explicit concat XLA cannot fold
    into the convolution, so every k>1 conv pays an extra HBM round
    trip of its padded input.  "zero" uses the conv's own SAME padding
    (folds away entirely); it changes values in a 1-px border only and
    requires (re)training with the same mode — a perf knob, not a
    drop-in for symmetric-trained weights."""

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = False
    norm: bool = True
    act: Any = None  # e.g. nn.relu
    dtype: Any = jnp.bfloat16
    bn_momentum: float = 0.95
    bn_epsilon: float = 1e-5
    pad_mode: str = "symmetric"

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.dilation * (self.kernel - 1) // 2
        padding = "VALID"
        fast_sym = (self.pad_mode == "symmetric_fast"
                    and self.kernel == 3 and self.stride == 1
                    and self.dilation == 1 and not self.use_bias)
        if self.kernel > 1 and not fast_sym:
            if self.pad_mode in ("symmetric", "symmetric_fast"):
                # symmetric_fast falls back to the explicit pad for the
                # shapes the border-corrected conv does not cover (the
                # single 7x7 stem conv).
                x = symmetric_pad(x, pad)
            else:
                assert self.pad_mode == "zero", self.pad_mode
                padding = "SAME"
        if fast_sym:
            # Same function as symmetric pad + VALID conv, minus the
            # padded-map HBM round trip (_FastSymConv3x3 docstring);
            # named Conv_0 so checkpoints restore verbatim.
            x = _FastSymConv3x3(self.features, dtype=self.dtype,
                                name="Conv_0")(x)
        else:
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride),
                        padding=padding,
                        kernel_dilation=(self.dilation, self.dilation),
                        use_bias=self.use_bias, dtype=self.dtype,
                        kernel_init=nn.initializers.he_normal())(x)
        if self.norm:
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=self.bn_momentum,
                             epsilon=self.bn_epsilon, dtype=self.dtype)(x)
        if self.act is not None:
            x = self.act(x)
        return x


class BasicBlock(nn.Module):
    """Two 3x3 convs + residual (reference enc.py:57-100)."""

    features: int
    dilation: int = 1
    residual: bool = True
    dtype: Any = jnp.bfloat16
    pad_mode: str = "symmetric"

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        if self.residual and x.shape[-1] != self.features:
            shortcut = ConvBN(self.features, kernel=1, dtype=self.dtype,
                              name="downsample")(x, train)
        y = ConvBN(self.features, 3, dilation=self.dilation, act=nn.relu,
                   dtype=self.dtype, pad_mode=self.pad_mode,
                   name="conv_bn1")(x, train)
        y = ConvBN(self.features, 3, dilation=self.dilation,
                   dtype=self.dtype, pad_mode=self.pad_mode,
                   name="conv_bn2")(y, train)
        if self.residual:
            y = y + shortcut
        return nn.relu(y)


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1(x4) + residual (reference enc.py:103-140)."""

    features: int
    dilation: int = 1
    expansion: int = 4
    dtype: Any = jnp.bfloat16
    pad_mode: str = "symmetric"

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.features * self.expansion
        shortcut = x
        if x.shape[-1] != out_ch:
            shortcut = ConvBN(out_ch, kernel=1, dtype=self.dtype,
                              name="downsample")(x, train)
        y = ConvBN(self.features, 1, act=nn.relu, dtype=self.dtype,
                   name="conv_bn1")(x, train)
        y = ConvBN(self.features, 3, dilation=self.dilation, act=nn.relu,
                   dtype=self.dtype, pad_mode=self.pad_mode,
                   name="conv_bn2")(y, train)
        y = ConvBN(out_ch, 1, dtype=self.dtype, name="conv_bn3")(y, train)
        return nn.relu(y + shortcut)


def _avg_pool2(x):
    """2x2/stride-2 average pool — the reference's downsampling
    (enc.py:160-161)."""
    return nn.avg_pool(x, (2, 2), strides=(2, 2), padding="VALID")


class DRN(nn.Module):
    """DRN backbone.  ``variant`` in {drn22, drn38, drn54}."""

    variant: str = "drn38"
    channels: Sequence[int] = (16, 32, 64, 128, 256, 512)
    image_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    image_std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    include_layer1: bool = True
    dtype: Any = jnp.bfloat16
    pad_mode: str = "symmetric"  # see ConvBN.pad_mode
    # Inference-only space-to-depth stem rewrite (models/stem_s2d.py):
    # same function, MXU/bandwidth-friendly layout; checkpoints trained
    # with the standard stem restore verbatim.
    stem_s2d: bool = False

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        """images: (B, H, W, 3) in [0, 255] -> [layer6 ... layer2
        (, layer1)] coarse-to-fine feature maps."""
        block_kind, depths = _VARIANTS[self.variant]
        Block = BasicBlock if block_kind == "basic" else BottleneckBlock

        mean = jnp.asarray(self.image_mean, jnp.float32)
        std = jnp.asarray(self.image_std, jnp.float32)
        x = ((images / 255.0 - mean) / std).astype(self.dtype)

        ch = self.channels
        pm = self.pad_mode
        if self.stem_s2d:
            # Same parameter tree as the standard branch below (holder
            # modules named layer0 / layer1_0), different compute
            # layout.  Training-mode BN would need per-phase batch
            # statistics, so this path is inference-only.
            if train:
                raise ValueError("stem_s2d is an inference-only layout "
                                 "knob; train with the standard stem")
            assert depths[0] == 1, "s2d stem assumes one layer1 conv"
            k0, bn0 = _ConvBNParams(7, x.shape[-1], ch[0],
                                    name="layer0")()
            k1, bn1 = _ConvBNParams(3, ch[0], ch[0], name="layer1_0")()
            layer1, x = stem_s2d(x, k0, bn0, k1, bn1, pm, self.dtype,
                                 ConvBN.bn_epsilon)
        else:
            # layer0: 7x7 stem (reference enc.py:190-192).
            x = ConvBN(ch[0], kernel=7, act=nn.relu, dtype=self.dtype,
                       pad_mode=pm, name="layer0")(x, train)
            # layers 1-2: plain conv stacks (reference enc.py:168-178).
            for i in range(depths[0]):
                x = ConvBN(ch[0], 3, act=nn.relu, dtype=self.dtype,
                           pad_mode=pm, name=f"layer1_{i}")(x, train)
            layer1 = x
            x = _avg_pool2(x)
        for i in range(depths[1]):
            x = ConvBN(ch[1], 3, act=nn.relu, dtype=self.dtype,
                       pad_mode=pm, name=f"layer2_{i}")(x, train)
        layer2 = x
        # layers 3-6: residual stages (reference enc.py:152-166).
        feats = []
        for stage, (f, d) in enumerate(zip(ch[2:], depths[2:]), start=3):
            x = _avg_pool2(x)
            for i in range(d):
                x = Block(f, dtype=self.dtype, pad_mode=pm,
                          name=f"layer{stage}_{i}")(x, train)
            feats.append(x)
        layer3, layer4, layer5, layer6 = feats
        out = [layer6, layer5, layer4, layer3, layer2]
        if self.include_layer1:
            out.append(layer1)
        return out
