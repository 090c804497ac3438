"""DeepLabV3 / DeepLabV3+ heads and assembled segmentation models (NHWC).

Parity with the reference heads (reference: seg_model/network/_deeplab.py):
  - ASPP: 1x1 + three dilated 3x3 (rates per output_stride) + global-pool
    branch, projected by 1x1 + dropout 0.1 (_deeplab.py:133-162).
  - DeepLabHeadV3Plus: 1x1 project low_level -> 48ch, ASPP(out) bilinearly
    upsampled, concat -> 3x3 conv 256 -> 1x1 classes (_deeplab.py:28-59).
  - DeepLabHead (V3): ASPP -> 3x3 256 -> classes (_deeplab.py:61-83).
  - Final bilinear upsample to input resolution (network/utils.py:13-18).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from weatherconverter_tpu.models.norm import bn_momentum

from weatherconverter_tpu.ops.image import global_avg_pool, resize_bilinear

Dtype = Any


class ConvBNReLU(nn.Module):
    """Conv-BN-ReLU with an optional atrous-separable conv body — the
    `separable=True` variant is the framework's equivalent of the reference's
    `convert_to_separable_conv` rewrite, which swaps every kernel>1 conv in
    the head for AtrousSeparableConvolution (reference:
    _deeplab.py:85-109,166-178). Here it is a construction-time option
    (make_seg_model(separable=True)) rather than a post-hoc module rewrite.
    """

    features: int
    kernel: int = 3
    dilation: int = 1
    padding: int | None = None
    train: bool = False
    separable: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = self.padding if self.padding is not None else self.dilation * (self.kernel - 1) // 2
        if self.separable and self.kernel > 1:
            cin = x.shape[-1]
            h = nn.Conv(
                cin,
                (self.kernel, self.kernel),
                padding=pad,
                kernel_dilation=(self.dilation, self.dilation),
                feature_group_count=cin,
                use_bias=False,
                dtype=self.dtype,
                name="depthwise",
            )(x)
            h = nn.Conv(
                self.features, (1, 1), use_bias=False, dtype=self.dtype,
                name="pointwise",
            )(h)
        else:
            h = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                padding=pad,
                kernel_dilation=(self.dilation, self.dilation),
                use_bias=False,
                dtype=self.dtype,
                name="conv",
            )(x)
        h = nn.BatchNorm(use_running_average=not self.train, momentum=bn_momentum(), dtype=self.dtype, name="bn")(h)
        return nn.relu(h)


class ASPP(nn.Module):
    """(reference: _deeplab.py:133-162)."""

    atrous_rates: Sequence[int]
    out_channels: int = 256
    train: bool = False
    deterministic: bool = True
    separable: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        res = [ConvBNReLU(self.out_channels, 1, train=self.train, dtype=self.dtype, name="conv1x1")(x)]
        for i, rate in enumerate(self.atrous_rates):
            res.append(
                ConvBNReLU(
                    self.out_channels, 3, dilation=rate, train=self.train,
                    separable=self.separable, dtype=self.dtype,
                    name=f"atrous{i}",
                )(x)
            )
        pooled = global_avg_pool(x)  # (N,1,1,C)
        pooled = ConvBNReLU(self.out_channels, 1, train=self.train, dtype=self.dtype, name="pool_conv")(pooled)
        pooled = resize_bilinear(pooled, (x.shape[1], x.shape[2]))
        res.append(pooled)
        h = jnp.concatenate(res, axis=-1)
        h = ConvBNReLU(self.out_channels, 1, train=self.train, dtype=self.dtype, name="project")(h)
        h = nn.Dropout(rate=0.1, deterministic=self.deterministic)(h)
        return h


class DeepLabHeadV3Plus(nn.Module):
    """(reference: _deeplab.py:28-59)."""

    num_classes: int
    aspp_dilate: Sequence[int]
    train: bool = False
    deterministic: bool = True
    separable: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: dict[str, jax.Array]) -> jax.Array:
        low = ConvBNReLU(48, 1, train=self.train, dtype=self.dtype, name="project")(feats["low_level"])
        aspp = ASPP(
            self.aspp_dilate, train=self.train, deterministic=self.deterministic,
            separable=self.separable, dtype=self.dtype, name="aspp",
        )(feats["out"])
        aspp = resize_bilinear(aspp, (low.shape[1], low.shape[2]))
        h = jnp.concatenate([low, aspp], axis=-1)
        h = ConvBNReLU(
            256, 3, train=self.train, separable=self.separable, dtype=self.dtype,
            name="classifier0",
        )(h)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="classifier1")(h)


class DeepLabHead(nn.Module):
    """(reference: _deeplab.py:61-83)."""

    num_classes: int
    aspp_dilate: Sequence[int]
    train: bool = False
    deterministic: bool = True
    separable: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: dict[str, jax.Array]) -> jax.Array:
        h = ASPP(
            self.aspp_dilate, train=self.train, deterministic=self.deterministic,
            separable=self.separable, dtype=self.dtype, name="aspp",
        )(feats["out"])
        h = ConvBNReLU(
            256, 3, train=self.train, separable=self.separable, dtype=self.dtype,
            name="classifier0",
        )(h)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="classifier1")(h)


class DeepLabV3(nn.Module):
    """backbone -> head -> bilinear upsample to input size
    (reference: network/utils.py:7-18).

    `bn_momentum` (torch convention) is the BACKBONE BatchNorm momentum for
    train-mode models — the reference applies it to the backbone only
    (`set_bn_momentum(model.backbone, 0.01)`, seg train.py:285 +
    utils.py:31-34), leaving the head at the torch default 0.1. The process
    knob in models/norm.py is read at TRACE time, so this module pins it at
    each train-mode trace: before the backbone call (this model's value, or
    the 0.1 default) and back to 0.1 before the head call. Pinning at trace
    entry — not at construction — means building another seg model in
    between cannot change what THIS model trains with (a construction-time
    pin regressed exactly that way: the loop builds its eval model after
    the train model but before the first trace; round-4 review)."""

    backbone: nn.Module
    head: nn.Module
    train: bool = False
    bn_momentum: Optional[float] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.train:
            from weatherconverter_tpu.models.norm import set_bn_momentum

            set_bn_momentum(0.1 if self.bn_momentum is None else self.bn_momentum)
        feats = self.backbone(x)
        if self.train:
            from weatherconverter_tpu.models.norm import set_bn_momentum

            set_bn_momentum(0.1)  # head BNs keep the torch default
        logits = self.head(feats)
        return resize_bilinear(logits, (x.shape[1], x.shape[2])).astype(jnp.float32)
