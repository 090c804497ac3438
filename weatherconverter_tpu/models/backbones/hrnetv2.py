"""HRNetV2 backbone (NHWC Flax).

Parity with the reference implementation
(reference: seg_model/network/backbone/hrnetv2.py): stem (two 3x3/s2 convs),
Bottleneck x4 stage1, multi-resolution branches with repeated fusion
(StageModule, reference hrnetv2.py:93-171), transitions creating new
half-resolution streams, and the HRNetV2 head that bilinearly upsamples all
streams to the highest resolution and concatenates (reference
hrnetv2.py:281-288 / network/utils.py:84-90). Feature dict: 'low_level' is the
stage-1 output (256ch, reference modeling.py:22) and 'out' the concatenated
stage-4 streams (sum of c*2^i)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from weatherconverter_tpu.models.norm import bn_momentum
from weatherconverter_tpu.ops.packed_conv import ConvParams, stem_conv

from weatherconverter_tpu.ops.image import resize_bilinear, resize_nearest

Dtype = Any


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = False
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        if cin <= 4 and self.stride == 2:
            # RGB stem: packed data-grad for the guidance backward
            # (ops/packed_conv.py; same rationale as the ResNet stem)
            kern, _ = ConvParams(
                (self.kernel, self.kernel, cin, self.features), name="conv"
            )()
            h = stem_conv(
                x.astype(self.dtype), kern.astype(self.dtype), 2,
                (self.kernel - 1) // 2,
            )
        else:
            h = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=(self.kernel - 1) // 2,
                use_bias=False,
                dtype=self.dtype,
                name="conv",
            )(x)
        h = nn.BatchNorm(use_running_average=not self.train, momentum=bn_momentum(), dtype=self.dtype, name="bn")(h)
        return nn.relu(h) if self.relu else h


class HRBottleneck(nn.Module):
    """(reference: hrnetv2.py:28-60)."""

    planes: int
    has_downsample: bool = False
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.relu(ConvBN(self.planes, 1, train=self.train, dtype=self.dtype, name="conv1")(x))
        h = nn.relu(ConvBN(self.planes, 3, train=self.train, dtype=self.dtype, name="conv2")(h))
        h = ConvBN(self.planes * 4, 1, train=self.train, dtype=self.dtype, name="conv3")(h)
        identity = (
            ConvBN(self.planes * 4, 1, train=self.train, dtype=self.dtype, name="downsample")(x)
            if self.has_downsample
            else x
        )
        return nn.relu(h + identity)


class HRBasicBlock(nn.Module):
    """(reference: hrnetv2.py:63-90)."""

    planes: int
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.relu(ConvBN(self.planes, 3, train=self.train, dtype=self.dtype, name="conv1")(x))
        h = ConvBN(self.planes, 3, train=self.train, dtype=self.dtype, name="conv2")(h)
        return nn.relu(h + x)


class StageModule(nn.Module):
    """Per-branch 4x BasicBlock then all-pairs fusion
    (reference: hrnetv2.py:93-170). Upsampling in fusion is nearest-neighbor
    (reference hrnetv2.py:127)."""

    num_branches: int
    output_branches: int
    c: int
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: list[jax.Array]) -> list[jax.Array]:
        branches = []
        for i in range(self.num_branches):
            ch = self.c * (2**i)
            h = xs[i]
            for b in range(4):
                h = HRBasicBlock(ch, train=self.train, dtype=self.dtype, name=f"branch{i}_block{b}")(h)
            branches.append(h)

        fused = []
        for o in range(self.output_branches):
            out_ch = self.c * (2**o)
            acc = None
            for i in range(self.num_branches):
                h = branches[i]
                if i == o:
                    pass
                elif i > o:
                    h = ConvBN(out_ch, 1, train=self.train, dtype=self.dtype, name=f"fuse{o}_{i}")(h)
                    scale = 2 ** (i - o)
                    n, hh, ww, cc = h.shape
                    h = resize_nearest(h, (hh * scale, ww * scale))
                else:
                    in_ch = self.c * (2**i)
                    for s in range(o - i - 1):
                        h = ConvBN(
                            in_ch, 3, 2, relu=True, train=self.train, dtype=self.dtype,
                            name=f"fuse{o}_{i}_down{s}",
                        )(h)
                    h = ConvBN(
                        out_ch, 3, 2, train=self.train, dtype=self.dtype, name=f"fuse{o}_{i}_down_last"
                    )(h)
                acc = h if acc is None else acc + h
            fused.append(nn.relu(acc))
        return fused


class HRNetV2Features(nn.Module):
    """(reference: hrnetv2.py:173-290 minus the classifier head)."""

    c: int = 32
    num_blocks: tuple = (1, 4, 3)
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> dict[str, jax.Array]:
        # Reference quirk reproduced: the DeepLab factory wraps HRNet in
        # IntermediateLayerGetter, which runs NAMED CHILDREN in registration
        # order — the single shared `relu` module registers once (after bn2),
        # so the stem it actually executes is conv1->bn1->conv2->bn2->relu
        # with NO relu between the two convs (reference network/utils.py:73-81
        # vs hrnetv2.py:259-265, where the standalone classifier net does
        # apply both relus).
        h = ConvBN(64, 3, 2, train=self.train, dtype=self.dtype, name="stem1")(x)
        h = nn.relu(ConvBN(64, 3, 2, train=self.train, dtype=self.dtype, name="stem2")(h))

        # Stage 1: 4 bottlenecks, 64 -> 256
        h = HRBottleneck(64, has_downsample=True, train=self.train, dtype=self.dtype, name="layer1_0")(h)
        for i in range(1, 4):
            h = HRBottleneck(64, train=self.train, dtype=self.dtype, name=f"layer1_{i}")(h)
        feats = {"low_level": h}

        # Transition 1: two streams
        s0 = ConvBN(self.c, 3, 1, relu=True, train=self.train, dtype=self.dtype, name="transition1_0")(h)
        s1 = ConvBN(self.c * 2, 3, 2, relu=True, train=self.train, dtype=self.dtype, name="transition1_1")(h)
        xs = [s0, s1]

        for b in range(self.num_blocks[0]):
            xs = StageModule(2, 2, self.c, train=self.train, dtype=self.dtype, name=f"stage2_{b}")(xs)
        xs.append(
            ConvBN(self.c * 4, 3, 2, relu=True, train=self.train, dtype=self.dtype, name="transition2")(xs[-1])
        )
        for b in range(self.num_blocks[1]):
            xs = StageModule(3, 3, self.c, train=self.train, dtype=self.dtype, name=f"stage3_{b}")(xs)
        xs.append(
            ConvBN(self.c * 8, 3, 2, relu=True, train=self.train, dtype=self.dtype, name="transition3")(xs[-1])
        )
        for b in range(self.num_blocks[2]):
            xs = StageModule(4, 4, self.c, train=self.train, dtype=self.dtype, name=f"stage4_{b}")(xs)

        # HRNetV2 concat head (reference: network/utils.py:84-90)
        hh, ww = xs[0].shape[1], xs[0].shape[2]
        ups = [xs[0]] + [resize_bilinear(s, (hh, ww)) for s in xs[1:]]
        feats["out"] = jnp.concatenate(ups, axis=-1)
        return feats
