"""Swift-SRGAN generator and discriminator — parity with the reference
(reference: srgan_model/models.py). The generator bridges the 128px diffusion
space to the 512px segmentation space inside the guided-sampling loop
(reference: translation.py:81,95).

TPU-first notes: separable convs map to `feature_group_count` grouped
convolutions; PixelShuffle is a reshape/transpose (ops/image.pixel_shuffle)
with torch channel ordering so imported torch weights reproduce outputs.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from weatherconverter_tpu.ops.image import adaptive_avg_pool, pixel_shuffle
from weatherconverter_tpu.ops.packed_conv import ConvParams, narrow_out_conv

Dtype = Any


class PReLU(nn.Module):
    """Per-channel PReLU, torch nn.PReLU(num_parameters=C) semantics
    (reference: srgan_model/models.py:32,45)."""

    channels: int
    alpha_init: float = 0.25

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        alpha = self.param(
            "alpha",
            lambda key, shape: jnp.full(shape, self.alpha_init, dtype=jnp.float32),
            (self.channels,),
        )
        # Cast alpha to the activation dtype: an f32 alpha would promote the
        # whole bf16 chain to f32 (2x HBM traffic on the hot translate path).
        return jnp.maximum(x, 0) + alpha.astype(x.dtype) * jnp.minimum(x, 0)


class SeparableConv(nn.Module):
    """Depthwise (groups=C_in) + pointwise 1x1
    (reference: srgan_model/models.py:5-21).

    TPU note: where the factorized form maps badly onto the MXU — big spatial
    kernels (9x9) or channel-changing convs, where XLA's grouped-conv lowering
    dominates the cost — the two stages are algebraically COMPOSED into one
    dense conv, K[h,w,i,o] = dw[h,w,i] * pw[i,o] (and bias' = pw(b_dw) + b_pw):
    bit-identical math up to fp reassociation, ~6x faster measured on v5e.
    The kernel composition is loop-invariant and hoisted out of sampling scans
    by XLA. Parameters keep the depthwise/pointwise structure so torch
    checkpoint import is unchanged."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        # Compose only where dense wins on the MXU: a tiny input-channel count
        # (the 3-channel stem, where grouped-conv lowering is pathological)
        # feeding a wide output. Wide-in/narrow-out (e.g. the final 64->3
        # 9x9) gets the shift-packed dense form below when shapes allow:
        # plain dense would pad C_out=3 to 128 lanes and pay ~8x the FLOPs
        # for nothing (measured slower on v5e).
        compose = cin < 16 and self.features >= 32
        pack = (
            _TAIL_PACK[0] > 0
            and cin >= 32
            and self.features <= 8
            and self.kernel_size >= 5
            and self.stride == 1
            and self.padding == self.kernel_size // 2
            and x.shape[1] % _TAIL_PACK[0] == 0
            and x.shape[2] % _TAIL_PACK[1] == 0
        )
        if pack:
            return self._shift_packed(x, cin, *_TAIL_PACK)
        if not compose:
            h = nn.Conv(
                cin,
                (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding=self.padding,
                feature_group_count=cin,
                use_bias=self.use_bias,
                dtype=self.dtype,
                name="depthwise",
            )(x)
            return nn.Conv(
                self.features, (1, 1), use_bias=self.use_bias, dtype=self.dtype,
                name="pointwise",
            )(h)

        # Declare the same params the factorized path owns (child scopes named
        # exactly like the nn.Conv modules above -> shared checkpoint layout),
        # then run one dense conv with the composed kernel.
        k = self.kernel_size
        dw_mod = _ConvParams((k, k, 1, cin), cin if self.use_bias else 0, name="depthwise")
        pw_mod = _ConvParams((1, 1, cin, self.features), self.features if self.use_bias else 0, name="pointwise")
        dw_kernel, dw_bias = dw_mod()
        pw_kernel, pw_bias = pw_mod()
        # composed dense kernel: (k, k, cin, features)
        dense = dw_kernel[:, :, 0, :, None] * pw_kernel[0, 0][None, None]
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            dense.astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = pw_bias + dw_bias @ pw_kernel[0, 0]
            out = out + bias.astype(out.dtype)
        return out

    def _shift_packed(self, x: jax.Array, cin: int, sh: int, sw: int) -> jax.Array:
        """Wide-in/narrow-out big-kernel separable conv (the Swift-SRGAN 9x9
        64->3 tail, reference srgan_model/models.py:90) as ONE dense strided
        conv whose output channels carry an (sh, sw) grid of shifted output
        pixels: C_out' = sh*sw*features fills the MXU's 128 output lanes that
        C_out=3 would waste (the padding tax that makes plain dense ~8x the
        useful FLOPs).

        Algebra: with h = sh*hb + a, w = sw*wb + b,
            out[hb*sh+a, wb*sw+b, o]
              = sum_{dh,dw,i} xp[sh*hb + (a+dh), sw*wb + (b+dw), i] K[dh,dw,i,o]
        i.e. a VALID conv over the padded input with kernel
        (k+sh-1, k+sw-1), strides (sh, sw), and packed kernel
            K'[a+dh, b+dw, i, (a,b,o)] = dw[dh,dw,i] * pw[i,o]
        followed by a reshape/transpose unpack. Identical math to
        depthwise+pointwise up to fp reassociation. The packed kernel is
        parameter-only, so XLA hoists its construction out of sampling scans.
        """
        k = self.kernel_size
        dw_mod = _ConvParams((k, k, 1, cin), cin if self.use_bias else 0, name="depthwise")
        pw_mod = _ConvParams((1, 1, cin, self.features), self.features if self.use_bias else 0, name="pointwise")
        dw_kernel, dw_bias = dw_mod()
        pw_kernel, pw_bias = pw_mod()
        dense = dw_kernel[:, :, 0, :, None] * pw_kernel[0, 0][None, None]  # (k,k,cin,cout)
        bias = pw_bias + dw_bias @ pw_kernel[0, 0] if self.use_bias else None
        return narrow_out_conv(
            x.astype(self.dtype), dense.astype(self.dtype), bias, pack=(sh, sw)
        )


# Shift-pack grid (sh, sw) for the narrow-output tail: 4x8 x 3ch = 96 of 128
# MXU lanes used vs 3 of 128 for plain dense. Chosen by in-situ A/B on v5e
# (scripts/ab_translate.py). "0x0" disables (factorized fallback).
import os as _os


def _parse_tail_pack(spec: str) -> tuple[int, int]:
    parts = spec.split("x")
    if len(parts) != 2 or not all(p.strip().isdigit() for p in parts):
        raise ValueError(
            f"WCTPU_TAIL_PACK must be 'NxM' (e.g. '4x8', '0x0' to disable); got {spec!r}"
        )
    sh, sw = int(parts[0]), int(parts[1])
    if sh == 0 or sw == 0:
        return (0, 0)  # any zero disables (avoids a modulo-by-zero at trace)
    return sh, sw


_TAIL_PACK = _parse_tail_pack(_os.environ.get("WCTPU_TAIL_PACK", "4x8"))


# Bare kernel(+bias) params with nn.Conv's names, so the composed
# SeparableConv paths share their checkpoint layout with the factorized one
# (single shared implementation; a verbatim copy lived here before).
_ConvParams = ConvParams


class ConvBlock(nn.Module):
    """SepConv -> [BN] -> [PReLU | LeakyReLU(0.2)]
    (reference: srgan_model/models.py:24-35)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_act: bool = True
    use_bn: bool = True
    discriminator: bool = False
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = SeparableConv(
            self.features,
            self.kernel_size,
            self.stride,
            self.padding,
            use_bias=not self.use_bn,
            dtype=self.dtype,
            name="cnn",
        )(x)
        if self.use_bn:
            h = nn.BatchNorm(use_running_average=not self.train, momentum=0.9, dtype=self.dtype, name="bn")(h)
        if self.use_act:
            if self.discriminator:
                h = nn.leaky_relu(h, negative_slope=0.2)
            else:
                h = PReLU(self.features, name="act")(h)
        return h


class UpsampleBlock(nn.Module):
    """SepConv(C -> C*r^2) -> PixelShuffle(r) -> PReLU
    (reference: srgan_model/models.py:38-48)."""

    channels: int
    scale_factor: int = 2
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = SeparableConv(
            self.channels * self.scale_factor**2, 3, 1, 1, dtype=self.dtype, name="conv"
        )(x)
        h = pixel_shuffle(h, self.scale_factor)
        return PReLU(self.channels, name="act")(h)


class ResidualBlock(nn.Module):
    """Two ConvBlocks with identity skip (reference: srgan_model/models.py:51-62)."""

    channels: int
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = ConvBlock(self.channels, train=self.train, dtype=self.dtype, name="block1")(x)
        h = ConvBlock(
            self.channels, use_act=False, train=self.train, dtype=self.dtype, name="block2"
        )(h)
        return h + x


class Generator(nn.Module):
    """Swift-SRGAN generator (reference: srgan_model/models.py:65-92):
    9x9 sep-conv stem -> num_blocks residuals -> conv + global skip -> 2x
    PixelShuffle upsamplers -> 9x9 sep-conv -> (tanh + 1) / 2."""

    in_channels: int = 3
    num_channels: int = 64
    num_blocks: int = 16
    upscale_factor: int = 4
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        initial = ConvBlock(
            self.num_channels, kernel_size=9, padding=4, use_bn=False,
            train=self.train, dtype=self.dtype, name="initial",
        )(x.astype(self.dtype))
        h = initial
        for i in range(self.num_blocks):
            h = ResidualBlock(
                self.num_channels, train=self.train, dtype=self.dtype, name=f"residual{i}"
            )(h)
        h = ConvBlock(
            self.num_channels, use_act=False, train=self.train, dtype=self.dtype,
            name="convblock",
        )(h)
        h = h + initial
        for i in range(self.upscale_factor // 2):
            h = UpsampleBlock(
                self.num_channels, 2, train=self.train, dtype=self.dtype, name=f"upsampler{i}"
            )(h)
        h = SeparableConv(self.in_channels, 9, 1, 4, dtype=self.dtype, name="final_conv")(h)
        return ((jnp.tanh(h) + 1.0) / 2.0).astype(jnp.float32)


class Discriminator(nn.Module):
    """Swift-SRGAN discriminator (reference: srgan_model/models.py:95-138).
    Defined-but-untrained in the reference pipeline; provided here with a
    working training path (training/train_srgan.py) for completeness."""

    in_channels: int = 3
    features: tuple = (64, 64, 128, 128, 256, 256, 512, 512)
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = x.astype(self.dtype)
        for idx, feature in enumerate(self.features):
            h = ConvBlock(
                feature,
                kernel_size=3,
                stride=1 + idx % 2,
                padding=1,
                discriminator=True,
                use_act=True,
                use_bn=(idx != 0),
                train=self.train,
                dtype=self.dtype,
                name=f"block{idx}",
            )(h)
        h = adaptive_avg_pool(h, (6, 6))
        # Flatten in torch NCHW order so imported classifier weights line up
        # (reference flattens (N, 512, 6, 6) at srgan_model/models.py:130).
        h = h.transpose(0, 3, 1, 2).reshape(h.shape[0], -1)
        h = nn.Dense(1024, dtype=self.dtype, name="fc1")(h)
        h = nn.leaky_relu(h, negative_slope=0.2)
        h = nn.Dense(1, dtype=self.dtype, name="fc2")(h)
        return jax.nn.sigmoid(h).astype(jnp.float32)
