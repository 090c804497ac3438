"""Legacy diffusion UNet — parity with the reference "old_model" architecture
that the shipped 1000-epoch checkpoint uses (reference:
diffusion_model/models/old_modules.py:230-360, loaded by
sample_integrated.py:89 and translation.py:106).

Conditioning is NOT an integer-timestep embedding: the model receives an
alpha-bar-derived *scalar* per example (one_minus_cum_prod[t], see reference
sample_integrated.py:57-64), embeds it with 32 log-spaced sin/cos frequencies,
broadcasts it to the image plane, and channel-concatenates it with the stem
features (reference: old_modules.py:283-317). `requires_alpha_hat_timestep` is
the reference's flag for this calling convention (old_modules.py:245).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from weatherconverter_tpu.ops.attention import multi_head_attention
from weatherconverter_tpu.ops.image import avg_pool, resize_bilinear
from weatherconverter_tpu.ops.time_embed import alpha_plane_embedding

Dtype = Any


class LegacySelfAttention(nn.Module):
    """LN -> MHA -> +x -> (LN -> Dense -> GELU -> Dense) -> +  over flattened
    tokens (reference: old_modules.py:73-94)."""

    channels: int
    num_heads: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        x_ln = nn.LayerNorm(name="ln")(tokens)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x_ln)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        d = c // self.num_heads

        def heads(t):
            return t.reshape(b, h * w, self.num_heads, d).transpose(0, 2, 1, 3)

        attn = multi_head_attention(heads(q), heads(k), heads(v))
        attn = attn.transpose(0, 2, 1, 3).reshape(b, h * w, c)
        attn = nn.Dense(c, dtype=self.dtype, name="out")(attn)
        attn = attn + tokens
        ff = nn.LayerNorm(name="ff_ln")(attn)
        ff = nn.Dense(c, dtype=self.dtype, name="ff1")(ff)
        # exact (erf) GELU: torch nn.GELU() default; flax's default is the
        # tanh approximation, which drifts ~4e-4/activation and compounds
        # over 7 attention blocks x 500 sampling steps (checkpoint parity)
        ff = nn.gelu(ff, approximate=False)
        ff = nn.Dense(c, dtype=self.dtype, name="ff2")(ff)
        out = ff + attn
        return out.reshape(b, h, w, c)


class LegacyResidualBlock(nn.Module):
    """BN -> Conv3x3 -> SiLU -> Conv3x3 (+ 1x1 residual when `residual`)
    (reference: old_modules.py:126-160). BatchNorm runs in inference mode by
    default (running stats) — the flagship use of this model is sampling."""

    out_channels: int
    residual: bool = False
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.BatchNorm(
            use_running_average=not self.train, momentum=0.9, dtype=self.dtype, name="bn"
        )(x)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv1"
        )(h)
        h = jax.nn.silu(h)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2"
        )(h)
        if self.residual:
            res = nn.Conv(
                self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="res"
            )(x)
        else:
            res = x
        return h + res


class LegacyDownBlock(nn.Module):
    """block_depth residual blocks (skips collected per block) + AvgPool2
    (reference: old_modules.py:163-193)."""

    out_channels: int
    block_depth: int = 3
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):
        skips = []
        for i in range(self.block_depth):
            x = LegacyResidualBlock(
                self.out_channels,
                residual=(i == 0),
                train=self.train,
                dtype=self.dtype,
                name=f"res{i}",
            )(x)
            skips.append(x)
        return avg_pool(x, 2, 2), skips


class LegacyUpBlock(nn.Module):
    """Bilinear 2x upsample, then block_depth x (concat popped skip -> resblock)
    (reference: old_modules.py:196-226)."""

    out_channels: int
    block_depth: int = 3
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, skips: list[jax.Array]) -> jax.Array:
        n, h, w, c = x.shape
        x = resize_bilinear(x, (h * 2, w * 2))
        skips = list(skips)
        for i in range(self.block_depth):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = LegacyResidualBlock(
                self.out_channels, residual=True, train=self.train, dtype=self.dtype,
                name=f"res{i}",
            )(x)
        return x


class LegacyUNet(nn.Module):
    """Reference old_modules.UNet (old_modules.py:230-360): fixed ladder
    32/64/96/128 with 256 bottleneck and LN-attention at 32/16/8 planes."""

    image_size: int = 128
    c_in: int = 3
    c_out: int = 3
    block_depth: int = 3
    train: bool = False
    dtype: Dtype = jnp.float32
    requires_alpha_hat_timestep: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, t: jax.Array) -> jax.Array:
        """`t` is the alpha-bar-style scalar, shape (B,) or (B,1,1,1)
        (reference: sample_integrated.py:57-64 passes one_minus_cum_prod[t])."""
        x = nn.Conv(32, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="pre_conv")(
            x.astype(self.dtype)
        )
        temb = alpha_plane_embedding(t, self.image_size, 32).astype(self.dtype)
        x = jnp.concatenate([x, temb], axis=-1)  # 64 channels

        x, skip1 = LegacyDownBlock(32, self.block_depth, self.train, self.dtype, name="down1")(x)
        x, skip2 = LegacyDownBlock(64, self.block_depth, self.train, self.dtype, name="down2")(x)
        x = LegacySelfAttention(64, dtype=self.dtype, name="attn_down3")(x)
        x, skip3 = LegacyDownBlock(96, self.block_depth, self.train, self.dtype, name="down3")(x)
        x = LegacySelfAttention(96, dtype=self.dtype, name="attn_down4")(x)
        x, skip4 = LegacyDownBlock(128, self.block_depth, self.train, self.dtype, name="down4")(x)

        x = LegacyResidualBlock(256, residual=True, train=self.train, dtype=self.dtype, name="bottleneck1")(x)
        x = LegacySelfAttention(256, dtype=self.dtype, name="attn_bottleneck")(x)
        x = LegacyResidualBlock(256, residual=True, train=self.train, dtype=self.dtype, name="bottleneck2")(x)

        x = LegacyUpBlock(128, self.block_depth, self.train, self.dtype, name="up1")(x, skip4)
        x = LegacySelfAttention(128, dtype=self.dtype, name="attn_up1")(x)
        x = LegacyUpBlock(96, self.block_depth, self.train, self.dtype, name="up2")(x, skip3)
        x = LegacySelfAttention(96, dtype=self.dtype, name="attn_up2")(x)
        x = LegacyUpBlock(64, self.block_depth, self.train, self.dtype, name="up3")(x, skip2)
        x = LegacyUpBlock(32, self.block_depth, self.train, self.dtype, name="up4")(x, skip1)

        out = nn.Conv(
            self.c_out, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="output"
        )(x)
        return out.astype(jnp.float32)
