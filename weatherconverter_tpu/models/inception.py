"""InceptionV3 — the standard FID feature extractor, NHWC flax.

Architecture follows the torchvision `inception_v3` module graph (stem,
Mixed_5b..7c, 2048-d global-average "pool3" features), so weights exported
from torchvision (or the pytorch-fid port of the original TF weights, which
shares the layout) import through compat.torch_import.convert_inception_v3.
The reference repository has no FID at all (SURVEY.md §6); this model exists
to close BASELINE.md's "FID parity" quality gate.

This image ships no pretrained weights and has no network egress, so the
module is validated structurally (shape/importer-layout tests); numerical
use requires a user-supplied torchvision-format .pth.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class BasicConv2d(nn.Module):
    """Conv(bias=False) -> BN(eps=1e-3) -> ReLU (torchvision BasicConv2d)."""

    features: int
    kernel: tuple[int, int]
    stride: int = 1
    padding: tuple[int, int] = (0, 0)
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Conv(
            self.features,
            self.kernel,
            strides=(self.stride, self.stride),
            padding=(self.padding[0], self.padding[1]),
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        h = nn.BatchNorm(
            use_running_average=not self.train, epsilon=1e-3, dtype=self.dtype, name="bn"
        )(h)
        return nn.relu(h)


def _avgpool3(x: jax.Array) -> jax.Array:
    """3x3 stride-1 avg pool, pad 1, count_include_pad=True (torch default)."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), ((0, 0), (1, 1), (1, 1), (0, 0))
    )
    return s / 9.0


def _maxpool3s2(x: jax.Array) -> jax.Array:
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class InceptionA(nn.Module):
    pool_features: int
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        a = dict(train=self.train, dtype=self.dtype)
        b1 = BasicConv2d(64, (1, 1), name="branch1x1", **a)(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1", **a)(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2", **a)(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1", **a)(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2", **a)(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3", **a)(b3)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool", **a)(_avgpool3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        a = dict(train=self.train, dtype=self.dtype)
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3", **a)(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1", **a)(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2", **a)(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3", **a)(bd)
        return jnp.concatenate([b3, bd, _maxpool3s2(x)], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        a = dict(train=self.train, dtype=self.dtype)
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1", **a)(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1", **a)(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2", **a)(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3", **a)(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1", **a)(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2", **a)(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3", **a)(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4", **a)(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5", **a)(bd)
        bp = BasicConv2d(192, (1, 1), name="branch_pool", **a)(_avgpool3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        a = dict(train=self.train, dtype=self.dtype)
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1", **a)(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2", **a)(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1", **a)(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2", **a)(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3", **a)(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4", **a)(b7)
        return jnp.concatenate([b3, b7, _maxpool3s2(x)], axis=-1)


class InceptionE(nn.Module):
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        a = dict(train=self.train, dtype=self.dtype)
        b1 = BasicConv2d(320, (1, 1), name="branch1x1", **a)(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1", **a)(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a", **a)(b3),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b", **a)(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1", **a)(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2", **a)(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a", **a)(bd),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b", **a)(bd),
        ], axis=-1)
        bp = BasicConv2d(192, (1, 1), name="branch_pool", **a)(_avgpool3(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Torchvision-graph InceptionV3. `__call__` returns 2048-d pool3
    features (the FID standard); `classify=True` appends the fc logits."""

    num_classes: int = 1000
    classify: bool = False
    transform_input: bool = False
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        a = dict(train=self.train, dtype=self.dtype)
        if self.transform_input:
            # torchvision transform_input: undo ImageNet normalization into
            # the TF-inception input scaling
            ch0 = x[..., 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
            ch1 = x[..., 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
            ch2 = x[..., 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
            x = jnp.concatenate([ch0, ch1, ch2], axis=-1)
        h = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3", **a)(x)
        h = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3", **a)(h)
        h = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3", **a)(h)
        h = _maxpool3s2(h)
        h = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1", **a)(h)
        h = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3", **a)(h)
        h = _maxpool3s2(h)
        h = InceptionA(32, name="Mixed_5b", **a)(h)
        h = InceptionA(64, name="Mixed_5c", **a)(h)
        h = InceptionA(64, name="Mixed_5d", **a)(h)
        h = InceptionB(name="Mixed_6a", **a)(h)
        h = InceptionC(128, name="Mixed_6b", **a)(h)
        h = InceptionC(160, name="Mixed_6c", **a)(h)
        h = InceptionC(160, name="Mixed_6d", **a)(h)
        h = InceptionC(192, name="Mixed_6e", **a)(h)
        h = InceptionD(name="Mixed_7a", **a)(h)
        h = InceptionE(name="Mixed_7b", **a)(h)
        h = InceptionE(name="Mixed_7c", **a)(h)
        feats = jnp.mean(h, axis=(1, 2)).astype(jnp.float32)  # pool3, 2048-d
        if not self.classify:
            return feats
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(feats).astype(jnp.float32)


def fid_input_resize(x: jax.Array) -> jax.Array:
    """Resize [0,1] RGB to the 299px, [-1,1] input FID evaluates at."""
    from weatherconverter_tpu.ops.image import resize_bilinear

    x = resize_bilinear(x.astype(jnp.float32), (299, 299))
    return x * 2.0 - 1.0
