"""DDPM UNet — TPU-native re-design of the reference architecture.

Capability parity with `Unet` (reference: diffusion_model/models/unet_base.py:
372-488): conv_in -> DownBlocks -> MidBlocks -> UpBlocks (skip-stack) ->
GN+SiLU+conv_out, with per-resolution attention gating via
`attn_resolutions` (reference: unet_base.py:404-405,434-435) and the
sinusoidal time embedding passed through a 2-layer MLP
(reference: unet_base.py:395-397,461-462).

Differences by design (TPU-first):
  - NHWC layout, bf16-friendly compute dtype, fused Pallas GN+SiLU and
    flash attention behind the `fused` flag.
  - No `.cuda()` device pinning (the reference hardcodes it at
    unet_base.py:461); everything is pure and placement-agnostic.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from weatherconverter_tpu.core.config import UnetModelConfig
from weatherconverter_tpu.models.layers import (
    ConvTranspose2dTorch,
    GroupNormSiLU,
    ResnetTimeBlock,
    SelfAttention2D,
)
from weatherconverter_tpu.ops.time_embed import timestep_embedding

Dtype = Any


class DownBlock(nn.Module):
    """num_layers x [resnet(+t), attn?] then 4x4/s2 downsample conv
    (reference: unet_base.py:64-164)."""

    out_channels: int
    num_layers: int
    num_heads: int
    use_attn: bool
    down_sample: bool
    fused: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, t_emb: jax.Array) -> jax.Array:
        out = x
        for i in range(self.num_layers):
            out = ResnetTimeBlock(
                self.out_channels, fused=self.fused, dtype=self.dtype, name=f"res{i}"
            )(out, t_emb)
            if self.use_attn:
                out = SelfAttention2D(
                    self.num_heads, fused=self.fused, dtype=self.dtype, name=f"attn{i}"
                )(out)
        if self.down_sample:
            out = nn.Conv(
                self.out_channels,
                (4, 4),
                strides=(2, 2),
                padding=1,
                dtype=self.dtype,
                name="down",
            )(out)
        return out


class MidBlock(nn.Module):
    """resnet, then num_layers x [attn?, resnet] (reference: unet_base.py:167-268)."""

    out_channels: int
    num_layers: int
    num_heads: int
    use_attn: bool = True
    fused: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, t_emb: jax.Array) -> jax.Array:
        out = ResnetTimeBlock(
            self.out_channels, fused=self.fused, dtype=self.dtype, name="res0"
        )(x, t_emb)
        for i in range(self.num_layers):
            if self.use_attn:
                out = SelfAttention2D(
                    self.num_heads, fused=self.fused, dtype=self.dtype, name=f"attn{i}"
                )(out)
            out = ResnetTimeBlock(
                self.out_channels, fused=self.fused, dtype=self.dtype, name=f"res{i+1}"
            )(out, t_emb)
        return out


class UpBlock(nn.Module):
    """ConvTranspose(4,2,1) upsample -> concat skip -> num_layers x
    [resnet(+t), attn?] (reference: unet_base.py:271-369)."""

    out_channels: int
    num_layers: int
    num_heads: int
    use_attn: bool
    up_sample: bool
    fused: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array, t_emb: jax.Array) -> jax.Array:
        if self.up_sample:
            x = ConvTranspose2dTorch(x.shape[-1], dtype=self.dtype, name="up")(x)
        out = jnp.concatenate([x, skip], axis=-1)
        for i in range(self.num_layers):
            out = ResnetTimeBlock(
                self.out_channels, fused=self.fused, dtype=self.dtype, name=f"res{i}"
            )(out, t_emb)
            if self.use_attn:
                out = SelfAttention2D(
                    self.num_heads, fused=self.fused, dtype=self.dtype, name=f"attn{i}"
                )(out)
        return out


class Unet(nn.Module):
    """eps-prediction UNet; config fields mirror the reference ModelConfig
    (reference: diffusion_model/config/config.yaml:16-28)."""

    config: UnetModelConfig
    fused: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, t: jax.Array) -> jax.Array:
        cfg = self.config
        down_channels = list(cfg.down_channels)
        mid_channels = list(cfg.mid_channels)
        down_sample = list(cfg.down_sample)
        assert mid_channels[0] == down_channels[-1]
        assert mid_channels[-1] == down_channels[-2]
        assert len(down_sample) == len(down_channels) - 1

        t = jnp.atleast_1d(t)
        if t.shape[0] != x.shape[0]:
            t = jnp.broadcast_to(t, (x.shape[0],))
        t_emb = timestep_embedding(t, cfg.time_emb_dim)
        t_emb = nn.Dense(cfg.time_emb_dim, dtype=self.dtype, name="t_proj1")(t_emb)
        t_emb = nn.Dense(cfg.time_emb_dim, dtype=self.dtype, name="t_proj2")(
            jax.nn.silu(t_emb)
        )

        out = nn.Conv(down_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(
            x.astype(self.dtype)
        )

        skips = []
        for i in range(len(down_channels) - 1):
            skips.append(out)
            use_attn = (cfg.im_size // (2**i)) in cfg.attn_resolutions
            out = DownBlock(
                down_channels[i + 1],
                cfg.num_down_layers,
                cfg.num_heads,
                use_attn=use_attn,
                down_sample=down_sample[i],
                fused=self.fused,
                dtype=self.dtype,
                name=f"down{i}",
            )(out, t_emb)

        for i in range(len(mid_channels) - 1):
            out = MidBlock(
                mid_channels[i + 1],
                cfg.num_mid_layers,
                cfg.num_heads,
                use_attn=True,
                fused=self.fused,
                dtype=self.dtype,
                name=f"mid{i}",
            )(out, t_emb)

        for idx, i in enumerate(reversed(range(len(down_channels) - 1))):
            use_attn = (cfg.im_size // (2**i)) in cfg.attn_resolutions
            out_ch = down_channels[i - 1] if i != 0 else down_channels[0]
            out = UpBlock(
                out_ch,
                cfg.num_up_layers,
                cfg.num_heads,
                use_attn=use_attn,
                up_sample=down_sample[i],
                fused=self.fused,
                dtype=self.dtype,
                name=f"up{idx}",
            )(out, skips.pop(), t_emb)

        out = GroupNormSiLU(fused=self.fused, name="norm_out")(out)
        out = nn.Conv(cfg.im_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(out)
        return out.astype(jnp.float32)


def make_unet(config: UnetModelConfig, fused: bool = True, dtype=jnp.float32) -> Unet:
    return Unet(config=config, fused=fused, dtype=dtype)
