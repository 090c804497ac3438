"""MobileNetV2 backbone with DeepLab dilation support (NHWC Flax).

Parity with the reference's dilation-aware variant
(reference: seg_model/network/backbone/mobilenetv2.py): convs carry padding=0
and each InvertedResidual explicitly pads its *whole input* with the
`fixed_padding(3, dilation)` asymmetric scheme (reference mobilenetv2.py:45-50,
75-78) — including the initial 1x1 expansion, a quirk we reproduce for
checkpoint-output parity. The stem ConvBNReLU(3, 32, stride=2) also has
padding=0 (reference mobilenetv2.py:39-40,122).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from weatherconverter_tpu.models.norm import bn_momentum
from weatherconverter_tpu.ops.packed_conv import ConvParams, stem_conv

Dtype = Any

# (expand_ratio t, channels c, repeats n, stride s) — reference mobilenetv2.py:102-112
INVERTED_RESIDUAL_SETTING = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]


def _make_divisible(v: float, divisor: int = 8, min_value: int | None = None) -> int:
    """Channel rounding (reference: mobilenetv2.py:16-33)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def fixed_padding(kernel_size: int, dilation: int) -> tuple[int, int]:
    """(pad_beg, pad_end) for an effective kernel (reference mobilenetv2.py:45-50)."""
    k_eff = kernel_size + (kernel_size - 1) * (dilation - 1)
    pad_total = k_eff - 1
    pad_beg = pad_total // 2
    return pad_beg, pad_total - pad_beg


class ConvBNReLU6(nn.Module):
    """Conv(padding=0) + BN + ReLU6 (reference: mobilenetv2.py:36-43)."""

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    relu6: bool = True
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        if cin <= 4 and self.stride == 2 and self.dilation == 1 and self.groups == 1:
            # RGB stem (input pre-padded by fixed_padding, conv pad=0):
            # packed data-grad for the guidance backward (ops/packed_conv.py)
            kern, _ = ConvParams(
                (self.kernel, self.kernel, cin, self.features), name="conv"
            )()
            h = stem_conv(x.astype(self.dtype), kern.astype(self.dtype), 2, 0)
        else:
            h = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=0,
                kernel_dilation=(self.dilation, self.dilation),
                feature_group_count=self.groups,
                use_bias=False,
                dtype=self.dtype,
                name="conv",
            )(x)
        h = nn.BatchNorm(use_running_average=not self.train, momentum=bn_momentum(), dtype=self.dtype, name="bn")(h)
        if self.relu6:
            h = jnp.minimum(nn.relu(h), 6.0)
        return h


class InvertedResidual(nn.Module):
    """(reference: mobilenetv2.py:52-82)."""

    in_channels: int
    out_channels: int
    stride: int
    dilation: int
    expand_ratio: int
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hidden = int(round(self.in_channels * self.expand_ratio))
        use_res = self.stride == 1 and self.in_channels == self.out_channels
        pb, pe = fixed_padding(3, self.dilation)
        h = jnp.pad(x, ((0, 0), (pb, pe), (pb, pe), (0, 0)))
        if self.expand_ratio != 1:
            h = ConvBNReLU6(hidden, 1, train=self.train, dtype=self.dtype, name="expand")(h)
        h = ConvBNReLU6(
            hidden, 3, self.stride, self.dilation, groups=hidden,
            train=self.train, dtype=self.dtype, name="depthwise",
        )(h)
        h = ConvBNReLU6(
            self.out_channels, 1, relu6=False, train=self.train, dtype=self.dtype, name="project"
        )(h)
        return x + h if use_res else h


class MobileNetV2Features(nn.Module):
    """Feature extractor returning {'low_level', 'out'} matching the factory's
    feature split (reference: seg_model/network/modeling.py:92-99:
    low_level = features[0:4] output (24ch), out = features[4:-1] output
    (320ch) — the final 1x1-to-1280 layer and classifier are dropped)."""

    output_stride: int = 16
    width_mult: float = 1.0
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> dict[str, jax.Array]:
        input_channel = _make_divisible(32 * self.width_mult)
        h = ConvBNReLU6(input_channel, 3, 2, train=self.train, dtype=self.dtype, name="stem")(x)
        current_stride = 2
        dilation = 1
        feats = {}
        block_idx = 1  # features[0] is the stem
        for t, c, n, s in INVERTED_RESIDUAL_SETTING:
            previous_dilation = dilation
            if current_stride == self.output_stride:
                stride = 1
                dilation *= s
            else:
                stride = s
                current_stride *= s
            # channel rounding exactly like the reference (mobilenetv2.py:129
            # uses _make_divisible, not a bare int cast — they differ for any
            # width_mult != 1 and break checkpoint import otherwise)
            output_channel = _make_divisible(c * self.width_mult)
            for i in range(n):
                h = InvertedResidual(
                    input_channel if i == 0 else output_channel,
                    output_channel,
                    stride if i == 0 else 1,
                    previous_dilation if i == 0 else dilation,
                    expand_ratio=t,
                    train=self.train,
                    dtype=self.dtype,
                    name=f"block{block_idx}",
                )(h)
                input_channel = output_channel
                if block_idx == 3:  # end of features[0:4] -> low_level (24ch)
                    feats["low_level"] = h
                block_idx += 1
        feats["out"] = h  # 320ch, the final ConvBNReLU6(1280) is dropped
        return feats
