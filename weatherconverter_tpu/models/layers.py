"""Shared Flax building blocks for the model families.

Layout is NHWC throughout (TPU-native); the torch reference is NCHW. Weight
conversion between the two lives in compat/torch_import.py.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from weatherconverter_tpu.ops.attention import multi_head_attention
from weatherconverter_tpu.ops.groupnorm import group_norm_reference, group_norm_silu

Dtype = Any


class GroupNormSiLU(nn.Module):
    """GroupNorm(groups) followed by SiLU, fused via Pallas when `fused`.

    Mirrors the reference's GN(8)+SiLU pre-conv pairs
    (reference: diffusion_model/models/unet_base.py:87-96)."""

    num_groups: int = 8
    fused: bool = True
    silu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if self.fused:
            return group_norm_silu(x, gamma, beta, self.num_groups, 1e-5, self.silu)
        return group_norm_reference(x, gamma, beta, self.num_groups, 1e-5, self.silu)


class SelfAttention2D(nn.Module):
    """Multi-head self-attention over flattened spatial tokens with a
    GroupNorm pre-norm and residual add — the attention sub-block of the
    reference's Down/Mid/Up blocks (reference: unet_base.py:112-120,153-161).

    Parameters mirror torch nn.MultiheadAttention for checkpoint import:
    qkv kernel (C, 3C) = in_proj_weight.T, out kernel (C, C) = out_proj.weight.T.
    """

    num_heads: int
    fused: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        hn = self.num_heads
        d = c // hn
        # Pre-norm: reference applies GroupNorm(8, C) over (B, C, N) tokens —
        # statistics over (group-channels x positions), identical to spatial GN.
        xin = GroupNormSiLU(num_groups=8, fused=self.fused, silu=False, name="norm")(x)
        tokens = xin.reshape(b, h * w, c)
        if os.environ.get("WCTPU_ATTN_SKIP_PROJ", "0") == "1":
            # TIMING PROBE ONLY (scripts/ab_translate.py): wrong math — runs
            # attention on un-projected tokens to bound what fusing the
            # qkv/out projections into the kernel could ever save. The ack
            # gate below makes a leaked env var fail loudly instead of
            # silently corrupting outputs AND the param tree (the qkv/out
            # Dense params would never be created: a checkpoint saved in
            # that state is missing parameters — CLAUDE.md rule 7).
            if os.environ.get("WCTPU_TIMING_PROBE_ACK", "0") != "1":
                raise RuntimeError(
                    "WCTPU_ATTN_SKIP_PROJ=1 is a WRONG-MATH timing probe "
                    "(skips the qkv/out projections). Set "
                    "WCTPU_TIMING_PROBE_ACK=1 as well to confirm this is a "
                    "timing run, or unset WCTPU_ATTN_SKIP_PROJ."
                )
            def heads_(t):
                return t.reshape(b, h * w, hn, d).transpose(0, 2, 1, 3)

            out = multi_head_attention(
                heads_(tokens), heads_(tokens), heads_(tokens),
                use_pallas=self.fused,
            )
            out = out.transpose(0, 2, 1, 3).reshape(b, h, w, c)
            return x + out
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(tokens)  # (B, N, 3C)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):  # (B, N, C) -> (B, H, N, D)
            return t.reshape(b, h * w, hn, d).transpose(0, 2, 1, 3)

        out = multi_head_attention(heads(q), heads(k), heads(v), use_pallas=self.fused)
        out = out.transpose(0, 2, 1, 3).reshape(b, h * w, c)
        out = nn.Dense(c, dtype=self.dtype, name="out")(out)
        return x + out.reshape(b, h, w, c)


class ResnetTimeBlock(nn.Module):
    """GN+SiLU -> Conv3x3 -> (+ time proj) -> GN+SiLU -> Conv3x3 -> + 1x1(x)
    (reference: unet_base.py:87-109,143-150)."""

    out_channels: int
    fused: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, t_emb: Optional[jax.Array]) -> jax.Array:
        h = GroupNormSiLU(fused=self.fused, name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        if t_emb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_proj")(
                jax.nn.silu(t_emb)
            )
            h = h + t[:, None, None, :]
        h = GroupNormSiLU(fused=self.fused, name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        res = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="residual")(x)
        return h + res


def conv_transpose_torch(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array],
    stride: int,
    padding: int,
) -> jax.Array:
    """2x upsampling transposed conv with torch ConvTranspose2d semantics
    (reference: unet_base.py:333-334 uses ConvTranspose2d(k=4, s=2, p=1)).

    `kernel` layout (kh, kw, cout, cin) — torch's (cin, cout, kh, kw)
    transposed to (2, 3, 1, 0) by the checkpoint importer.

    Implemented as an lhs-dilated conv_general_dilated with an explicitly
    flipped kernel (the textbook adjoint) rather than `lax.conv_transpose`:
    on the v5e backend in this image, conv_transpose(transpose_kernel=True)
    hangs the compiler for 9+ minutes, while the equivalent lhs-dilation
    form compiles in <1 s. Verified bit-equal (<2e-6) vs
    torch.nn.functional.conv_transpose2d.

    A sub-pixel phase decomposition (one 2x2 conv with C_out'=4*C_out +
    interleave — 4x fewer scheduled MACs than a naive zero-inserting
    lowering) was built, verified exact, and measured FLAT in situ on v5e
    (round 6, PROFILE.md attack log): XLA already strength-reduces the
    lhs-dilation. Reverted per the tap-matmul policy; git history has it.
    """
    k = kernel.shape[0]
    pad = k - 1 - padding
    flipped = kernel[::-1, ::-1].transpose(0, 1, 3, 2)  # -> (kh, kw, cin, cout)
    out = jax.lax.conv_general_dilated(
        x,
        flipped,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + bias
    return out


class ConvTranspose2dTorch(nn.Module):
    """Module wrapper over `conv_transpose_torch` with its own params."""

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, self.features, cin),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return conv_transpose_torch(
            x.astype(self.dtype), kernel.astype(self.dtype), bias.astype(self.dtype),
            self.stride, self.padding
        )
