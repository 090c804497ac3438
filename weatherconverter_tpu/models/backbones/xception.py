"""Xception backbone with DeepLab dilation support (NHWC Flax).

Parity with the reference's Cadene-port clone
(reference: seg_model/network/backbone/xception.py:45-238). The DeepLab
factory taps 'block1' as low_level (128ch) and 'conv4' (the separable conv
output BEFORE bn4) as 'out' (2048ch) — reference modeling.py:74 with
IntermediateLayerGetter capturing raw child outputs (network/utils.py:71-92).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from weatherconverter_tpu.models.norm import bn_momentum
from weatherconverter_tpu.ops.packed_conv import ConvParams, stem_conv

Dtype = Any


class SeparableConvX(nn.Module):
    """Depthwise (groups=cin) then pointwise, both bias-free
    (reference: xception.py:45-55)."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        h = nn.Conv(
            cin,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=self.padding,
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=cin,
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        return nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="pointwise")(h)


def max_pool_3x3(x: jax.Array, stride: int) -> jax.Array:
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


class XceptionBlock(nn.Module):
    """(reference: xception.py:58-105). `rep` layout: [ReLU] SepConv BN
    repeated, optional trailing MaxPool(3, stride, 1); 1x1-conv+BN skip when
    channels or stride change."""

    in_filters: int
    out_filters: int
    reps: int
    strides: int = 1
    start_with_relu: bool = True
    grow_first: bool = True
    dilation: int = 1
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = x
        idx = 0
        seq: list[tuple[str, int]] = []  # (kind, features)
        if self.grow_first:
            seq.append(("relu_sep", self.out_filters))
        for _ in range(self.reps - 1):
            seq.append(("relu_sep", self.out_filters if self.grow_first else self.in_filters))
        if not self.grow_first:
            seq.append(("relu_sep", self.out_filters))
        first = True
        for kind, feats in seq:
            if not (first and not self.start_with_relu):
                h = nn.relu(h)
            first = False
            h = SeparableConvX(
                feats, 3, 1, self.dilation, self.dilation, dtype=self.dtype, name=f"sep{idx}"
            )(h)
            h = nn.BatchNorm(use_running_average=not self.train, momentum=bn_momentum(), dtype=self.dtype, name=f"bn{idx}")(h)
            idx += 1
        if self.strides != 1:
            h = max_pool_3x3(h, self.strides)
        if self.out_filters != self.in_filters or self.strides != 1:
            skip = nn.Conv(
                self.out_filters, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, dtype=self.dtype, name="skip",
            )(x)
            skip = nn.BatchNorm(use_running_average=not self.train, momentum=bn_momentum(), dtype=self.dtype, name="skipbn")(skip)
        else:
            skip = x
        return h + skip


class XceptionFeatures(nn.Module):
    """Feature extractor: {'low_level': block1 (128ch), 'out': conv4 pre-bn
    (2048ch)} (reference: modeling.py:60-81)."""

    replace_stride_with_dilation: Sequence[bool] = (False, False, False, True)
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> dict[str, jax.Array]:
        rswd = list(self.replace_stride_with_dilation)
        dilation = 1

        def stride_dil(s: int, dilate: bool) -> tuple[int, int]:
            nonlocal dilation
            if dilate:
                dilation *= s
                return 1, dilation
            return s, dilation

        # RGB stem: packed data-grad for the guidance backward
        # (ops/packed_conv.py; same rationale as the ResNet stem)
        _k1, _ = ConvParams((3, 3, x.shape[-1], 32), name="conv1")()
        h = stem_conv(x.astype(self.dtype), _k1.astype(self.dtype), 2, 0)
        h = nn.BatchNorm(use_running_average=not self.train, momentum=bn_momentum(), dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(64, (3, 3), padding=0, use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not self.train, momentum=bn_momentum(), dtype=self.dtype, name="bn2")(h)
        h = nn.relu(h)

        feats = {}
        s, d = stride_dil(2, rswd[0])
        h = XceptionBlock(64, 128, 2, s, start_with_relu=False, grow_first=True,
                          dilation=d, train=self.train, dtype=self.dtype, name="block1")(h)
        feats["low_level"] = h
        s, d = stride_dil(2, rswd[1])
        h = XceptionBlock(128, 256, 2, s, dilation=d, train=self.train, dtype=self.dtype, name="block2")(h)
        s, d = stride_dil(2, rswd[2])
        h = XceptionBlock(256, 728, 2, s, dilation=d, train=self.train, dtype=self.dtype, name="block3")(h)
        for i in range(4, 12):
            # middle blocks inherit the current (post-block3) dilation
            h = XceptionBlock(728, 728, 3, 1, dilation=dilation, train=self.train,
                              dtype=self.dtype, name=f"block{i}")(h)
        s, d = stride_dil(2, rswd[3])
        h = XceptionBlock(728, 1024, 2, s, grow_first=False, dilation=d,
                          train=self.train, dtype=self.dtype, name="block12")(h)
        h = SeparableConvX(1536, 3, 1, 1, dilation, dtype=self.dtype, name="conv3")(h)
        h = nn.BatchNorm(use_running_average=not self.train, momentum=bn_momentum(), dtype=self.dtype, name="bn3")(h)
        h = nn.relu(h)
        h = SeparableConvX(2048, 3, 1, 1, dilation, dtype=self.dtype, name="conv4")(h)
        feats["out"] = h  # pre-bn4, matching the reference's layer tap
        return feats
