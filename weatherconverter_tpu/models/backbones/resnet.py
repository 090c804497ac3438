"""ResNet backbone family with DeepLab dilation support (NHWC Flax).

Capability parity with the reference's torchvision-clone
(reference: seg_model/network/backbone/resnet.py:121-213; dilation logic at
resnet.py:174-196): resnet18/34/50/101/152, `replace_stride_with_dilation`
converts later stages' strides into dilation so output_stride 8/16 feature
maps feed the ASPP. Feature extraction returns the {'low_level', 'out'} dict
the DeepLab heads consume directly — replacing the reference's reflective
`IntermediateLayerGetter` traversal (seg_model/network/utils.py:21-93) with an
explicit functional interface (jit-friendly, no module-dict iteration).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from weatherconverter_tpu.models.norm import bn_momentum
from weatherconverter_tpu.ops.packed_conv import ConvParams, stem_conv

Dtype = Any

# Equivalence toggle (tests flip it to compare against the plain nn.Conv
# autodiff path); parameter layout is identical either way.
_PACKED_STEM_BWD = True


class ConvBN(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = self.dilation * (self.kernel - 1) // 2
        cin = x.shape[-1]
        # RGB stem (cin=3, stride 2): its autodiff data-grad — the hot op of
        # the SGG guidance backward (jax.grad w.r.t. the input image,
        # reference sgg.py:16 + inference.py:131-143) — is a transposed conv
        # with C_out=3 that wastes ~97% of the MXU's output lanes AND 3/4 of
        # its contraction on dilation zeros. stem_conv re-expresses that
        # backward parity-decomposed + shift-packed (ops/packed_conv.py);
        # forward math is the identical XLA conv.
        if (
            _PACKED_STEM_BWD
            and cin <= 4
            and self.stride == 2
            and self.dilation == 1
            and self.groups == 1
        ):
            kern, _ = ConvParams(
                (self.kernel, self.kernel, cin, self.features), name="conv"
            )()
            h = stem_conv(
                x.astype(self.dtype), kern.astype(self.dtype), 2, pad
            )
        else:
            h = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=pad,
                kernel_dilation=(self.dilation, self.dilation),
                feature_group_count=self.groups,
                use_bias=False,
                dtype=self.dtype,
                name="conv",
            )(x)
        return nn.BatchNorm(use_running_average=not self.train, momentum=bn_momentum(), dtype=self.dtype, name="bn")(h)


class BasicBlock(nn.Module):
    """resnet18/34 block (3x3 + 3x3), expansion 1."""

    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    train: bool = False
    dtype: Dtype = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = ConvBN(self.planes, 3, self.stride, self.dilation, train=self.train, dtype=self.dtype, name="conv1")(x)
        h = nn.relu(h)
        h = ConvBN(self.planes, 3, 1, self.dilation, train=self.train, dtype=self.dtype, name="conv2")(h)
        if self.has_downsample:
            identity = ConvBN(self.planes, 1, self.stride, train=self.train, dtype=self.dtype, name="downsample")(x)
        else:
            identity = x
        return nn.relu(h + identity)


class Bottleneck(nn.Module):
    """resnet50/101/152 block (1x1 -> 3x3 -> 1x1 x4), expansion 4. The 3x3
    carries stride, dilation, and — for the ResNeXt/wide variants — groups
    and base_width (width = planes * base_width/64 * groups; reference
    resnet.py:81-103, torchvision semantics)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    groups: int = 1
    base_width: int = 64
    train: bool = False
    dtype: Dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        h = ConvBN(width, 1, train=self.train, dtype=self.dtype, name="conv1")(x)
        h = nn.relu(h)
        h = ConvBN(width, 3, self.stride, self.dilation, groups=self.groups, train=self.train, dtype=self.dtype, name="conv2")(h)
        h = nn.relu(h)
        h = ConvBN(self.planes * 4, 1, train=self.train, dtype=self.dtype, name="conv3")(h)
        if self.has_downsample:
            identity = ConvBN(self.planes * 4, 1, self.stride, train=self.train, dtype=self.dtype, name="downsample")(x)
        else:
            identity = x
        return nn.relu(h + identity)


def max_pool_3x3_s2(x: jax.Array) -> jax.Array:
    """torch MaxPool2d(kernel_size=3, stride=2, padding=1), NHWC.

    Differentiates through XLA's SelectAndScatter — measured OPTIMAL on the
    v5e: a gather-based 9-tap first-match-wins custom VJP (round 6, git
    history) was grad-exact but 7 ms/step SLOWER in situ (PROFILE.md
    round-6 attack log)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


class ResNet(nn.Module):
    """Feature-extracting ResNet. Returns {'low_level': layer1, 'out': layer4}
    matching the reference's return_layers for DeepLabV3+
    (reference: seg_model/network/modeling.py:49)."""

    layers: Sequence[int]
    bottleneck: bool = True
    replace_stride_with_dilation: Sequence[bool] = (False, False, True)
    groups: int = 1
    base_width: int = 64
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> dict[str, jax.Array]:
        if self.bottleneck:
            from functools import partial

            block_cls = partial(
                Bottleneck, groups=self.groups, base_width=self.base_width
            )
        else:
            if self.groups != 1 or self.base_width != 64:
                raise ValueError(
                    "BasicBlock only supports groups=1 and base_width=64"
                )  # reference resnet.py:46-47
            block_cls = BasicBlock
        expansion = 4 if self.bottleneck else 1

        h = ConvBN(64, 7, 2, train=self.train, dtype=self.dtype, name="stem")(x)
        h = nn.relu(h)
        h = max_pool_3x3_s2(h)

        dilation = 1
        inplanes = 64
        feats = {}
        for stage_idx, (planes, blocks) in enumerate(zip((64, 128, 256, 512), self.layers)):
            stride = 1 if stage_idx == 0 else 2
            dilate = stage_idx > 0 and self.replace_stride_with_dilation[stage_idx - 1]
            previous_dilation = dilation
            if dilate:
                dilation *= stride
                stride = 1
            for b in range(blocks):
                has_down = b == 0 and (stride != 1 or inplanes != planes * expansion)
                h = block_cls(
                    planes,
                    stride=stride if b == 0 else 1,
                    dilation=previous_dilation if b == 0 else dilation,
                    has_downsample=has_down,
                    train=self.train,
                    dtype=self.dtype,
                    name=f"layer{stage_idx+1}_{b}",
                )(h)
                inplanes = planes * expansion
            if stage_idx == 0:
                feats["low_level"] = h  # 256ch (bottleneck) / 64ch (basic)
        feats["out"] = h
        return feats


def resnet18(**kw) -> ResNet:
    return ResNet(layers=(2, 2, 2, 2), bottleneck=False, **kw)


def resnet34(**kw) -> ResNet:
    return ResNet(layers=(3, 4, 6, 3), bottleneck=False, **kw)


def resnet50(**kw) -> ResNet:
    return ResNet(layers=(3, 4, 6, 3), bottleneck=True, **kw)


def resnet101(**kw) -> ResNet:
    return ResNet(layers=(3, 4, 23, 3), bottleneck=True, **kw)


def resnet152(**kw) -> ResNet:
    return ResNet(layers=(3, 8, 36, 3), bottleneck=True, **kw)


def resnext50_32x4d(**kw) -> ResNet:
    """(reference resnet.py:285-297 — groups=32, width_per_group=4)."""
    return ResNet(layers=(3, 4, 6, 3), bottleneck=True, groups=32, base_width=4, **kw)


def resnext101_32x8d(**kw) -> ResNet:
    """(reference resnet.py:299-311 — groups=32, width_per_group=8)."""
    return ResNet(layers=(3, 4, 23, 3), bottleneck=True, groups=32, base_width=8, **kw)


def wide_resnet50_2(**kw) -> ResNet:
    """(reference resnet.py:314-330 — width_per_group=128: 2x-wide inner 3x3,
    outer 1x1 channels unchanged)."""
    return ResNet(layers=(3, 4, 6, 3), bottleneck=True, base_width=128, **kw)


def wide_resnet101_2(**kw) -> ResNet:
    """(reference resnet.py:333-348 — width_per_group=128)."""
    return ResNet(layers=(3, 4, 23, 3), bottleneck=True, base_width=128, **kw)
