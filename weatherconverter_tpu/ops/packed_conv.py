"""Shift-packed convolution forms for narrow-channel convs on the MXU.

The MXU pads conv output channels to 128 lanes, so a conv with C_out=3 (the
SRGAN 9x9 tail, reference srgan_model/models.py:90) or a data-gradient back
to a 3-channel image (the DeepLab ResNet stem inside the SGG guidance
backward, reference seg_model/network/backbone/resnet.py stem + sgg.py:16)
wastes ~97% of the MXU's output lanes. Two transformations fix that, both
bit-identical up to fp reassociation:

1. **Shift-packing**: a stride-1 VALID conv with kernel K (kh, kw, ci, co)
   is re-expressed with strides (sh, sw) and output channels carrying an
   (sh, sw) grid of shifted output pixels:
       K'[a+jh, b+jw, ci, (a, b, o)] = K[jh, jw, ci, o]
   followed by a reshape/transpose unpack. C_out' = sh*sw*co fills the lanes.

2. **Parity decomposition** (for strided-conv data-grads): the gradient of a
   stride-s conv w.r.t. its input is normally a conv over the s-dilated
   cotangent — 1-1/s^2 of the MXU contraction multiplies structural zeros.
   Splitting output pixels by (row, col) parity turns it into ONE dense
   stride-1 conv with kernel
       K[jh, jw, co, (ah, aw, i)] = w_flip[(p-ah) % s + s*jh,
                                           (p-aw) % s + s*jw, i-major]
   and a sub-pixel (pixel-shuffle) unpack — no dilation zeros, and the
   (s*s*ci) output channels then shift-pack to fill the lanes.

Measured on v5e (scripts/micro_seg_grad.py, scripts/ab_translate.py): the
7x7/s2 stem data-grad at 256px B=8 drops from ~4.4 ms to well under 1 ms of
MXU work; the SRGAN tail shift-pack took the full translate scan from 27.2
to 26.1 ms/step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvParams(nn.Module):
    """Kernel(+bias) params with nn.Conv's scope layout, so packed conv
    paths share their checkpoint layout with the nn.Conv they replace."""

    kernel_shape: tuple
    bias_features: int = 0

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), self.kernel_shape
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.bias_features,))
            if self.bias_features
            else None
        )
        return kernel, bias


def shift_pack_kernel(kernel: jax.Array, sh: int, sw: int) -> jax.Array:
    """(kh, kw, ci, co) -> (kh+sh-1, kw+sw-1, ci, sh*sw*co) with the (a, b)
    shift grid merged into the output-channel dim (ordered a-major, then b,
    then original channel)."""
    kh, kw, ci, co = kernel.shape
    shifted = jnp.stack(
        [
            jnp.stack(
                [
                    jnp.pad(kernel, ((a, sh - 1 - a), (b, sw - 1 - b), (0, 0), (0, 0)))
                    for b in range(sw)
                ],
                axis=0,
            )
            for a in range(sh)
        ],
        axis=0,
    )  # (sh, sw, kh+sh-1, kw+sw-1, ci, co)
    return shifted.transpose(2, 3, 4, 0, 1, 5).reshape(
        kh + sh - 1, kw + sw - 1, ci, sh * sw * co
    )


def shift_packed_conv(
    xp: jax.Array, kernel: jax.Array, sh: int, sw: int
) -> jax.Array:
    """VALID conv of the (already padded) input `xp` with `kernel`, computed
    shift-packed with grid (sh, sw) and unpacked back to full resolution.
    Output spatial dims: (H_p - kh + 1, W_p - kw + 1) — they must be
    divisible by (sh, sw)."""
    kh, kw, ci, co = kernel.shape
    kp = shift_pack_kernel(kernel, sh, sw)
    y = jax.lax.conv_general_dilated(
        xp,
        kp.astype(xp.dtype),
        window_strides=(sh, sw),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, H/sh, W/sw, sh*sw*co)
    b, hb, wb, _ = y.shape
    y = y.reshape(b, hb, wb, sh, sw, co)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, hb * sh, wb * sw, co)


def _parity_kernel(w: jax.Array, stride: int, pad: int) -> tuple[jax.Array, int]:
    """Build the parity-decomposed data-grad kernel for a square-kernel,
    stride-s, symmetric-pad conv.

    Returns (K, off): K has shape (j, j, co, s*s*ci) with j = ceil-ish tap
    count, and the conv must read the cotangent padded by `-off` on the low
    side (off <= 0) and enough on the high side (see conv_data_grad_packed).

    Derivation: dx[s*m + a] = sum_j W_a[j] g[m + off_a + j] with
    W_a[j] = w_flip[(pad - a) % s + s*j] and
    off_a = (a + (pad - a) % s - pad) / s. We pad all parities to the same
    tap count and a common base offset off = min_a off_a, shifting each
    parity's taps accordingly (out-of-range taps are zero).
    """
    k = w.shape[0]
    ci, co = w.shape[2], w.shape[3]
    s = stride
    wf = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)  # (k, k, co, ci), flipped

    # per-parity 1D tap index sets (in flipped-kernel coordinates):
    # dx[s*m + a] = sum_j wf[u0_a + s*j] g[m + off_a + j] with
    # u0_a = (k-1-a-pad) % s and off_a = (a + pad - (k-1) + u0_a) / s
    # (general padding; for SAME padding k = 2*pad+1 this reduces to
    # off_a = (a + u0_a - pad) / s).
    tap_u = []  # tap_u[a] = list of u indices, g offset = off_a + j
    offs = []
    jmax = 0
    for a in range(s):
        u0 = (k - 1 - a - pad) % s
        us = list(range(u0, k, s))
        off_a = (a + pad - (k - 1) + u0) // s
        tap_u.append(us)
        offs.append(off_a)
        jmax = max(jmax, len(us))
    off = min(offs)

    # K[jh, jw, co, (ah, aw, i)]; parity a reads g at m + off + jh', where
    # jh' = (off_a - off) + j for its j-th tap
    blocks = jnp.zeros((s, s, jmax + max(offs) - off, jmax + max(offs) - off, co, ci), w.dtype)
    jdim = blocks.shape[2]
    for ah in range(s):
        sh_h = offs[ah] - off
        for aw in range(s):
            sh_w = offs[aw] - off
            for jh, uh in enumerate(tap_u[ah]):
                for jw, uw in enumerate(tap_u[aw]):
                    blocks = blocks.at[ah, aw, sh_h + jh, sh_w + jw].set(wf[uh, uw])
    kk = blocks.transpose(2, 3, 4, 0, 1, 5).reshape(jdim, jdim, co, s * s * ci)
    return kk, off


def conv_data_grad_packed(
    g: jax.Array,
    w: jax.Array,
    stride: int,
    pad: int,
    x_hw: tuple[int, int],
    lane_pack: tuple[int, int] | None = None,
) -> jax.Array:
    """d(conv2d(x, w, stride, pad)) / dx applied to cotangent g, computed
    parity-decomposed (+ optionally shift-packed), for square kernels and
    symmetric padding. g: (B, Hg, Wg, co) -> (B, *x_hw, ci)."""
    s = stride
    kk, off = _parity_kernel(w, s, pad)
    jdim = kk.shape[0]
    hx, wx = x_hw
    hm, wm = hx // s + (hx % s > 0), wx // s + (wx % s > 0)
    # parity output block m ranges over ceil(x/s); g index m + off + j must
    # land in [0, Hg) -> pad g low by -off and high to reach hm-1+off+jdim-1
    pad_lo = -off
    pad_hi_h = max(0, (hm - 1) + off + (jdim - 1) - (g.shape[1] - 1))
    pad_hi_w = max(0, (wm - 1) + off + (jdim - 1) - (g.shape[2] - 1))
    gp = jnp.pad(g, ((0, 0), (pad_lo, pad_hi_h), (pad_lo, pad_hi_w), (0, 0)))

    if lane_pack is not None and hm % lane_pack[0] == 0 and wm % lane_pack[1] == 0:
        y = shift_packed_conv(gp, kk, *lane_pack)
    else:
        y = jax.lax.conv_general_dilated(
            gp, kk.astype(gp.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    # y: (B, hm, wm, s*s*ci) -> sub-pixel unpack (ah, aw, i ordering)
    b = y.shape[0]
    ci = w.shape[2]
    y = y.reshape(b, hm, wm, s, s, ci)
    dx = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, hm * s, wm * s, ci)
    return dx[:, :hx, :wx, :]


def narrow_out_conv(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    pack: tuple[int, int] = (4, 8),
) -> jax.Array:
    """Stride-1 SAME conv with a narrow output-channel count (C_out <= 8),
    computed shift-packed when the spatial dims divide the pack grid (plain
    XLA conv otherwise). Used for the UNet 3x3 conv_out (reference
    unet_base.py:447) and as the building block of the SRGAN tail: plain
    lowering pays the 128-lane C_out padding tax (measured 2.2 -> 1.0 ms for
    the 128px conv_out at B=8, scripts/micro_seg_parts.py)."""
    kh, kw = kernel.shape[0], kernel.shape[1]
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    if x.shape[1] % pack[0] == 0 and x.shape[2] % pack[1] == 0 and kh % 2 and kw % 2:
        xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
        out = shift_packed_conv(xp, kernel, *pack)
    else:
        out = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (1, 1), ((ph, ph), (pw, pw)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


# Lane-fill grid for the packed data-grad: with s=2, ci=3 the sub-pixel
# channels are 12; a (2, 4) shift grid packs 96 of 128 lanes (in-situ A/B
# winner for the SRGAN tail family; re-validated for the stem in
# scripts/micro_seg_grad.py).
_STEM_PACK = (2, 4)

from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def stem_conv(x: jax.Array, w: jax.Array, stride: int = 2, pad: int = 3) -> jax.Array:
    """conv2d NHWC/HWIO with a shift-packed, parity-decomposed backward to
    the input — for narrow-C_in stems (e.g. the DeepLab ResNet 7x7/s2 RGB
    stem) that sit inside `jax.grad` on the guidance hot path. Forward and
    filter-gradient are XLA-native; only the data-gradient is re-expressed."""
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _stem_fwd_vjp(x, w, stride, pad):
    return stem_conv(x, w, stride, pad), (x, w)


def _stem_bwd(stride, pad, res, g):
    x, w = res
    dx = conv_data_grad_packed(
        g, w, stride, pad, (x.shape[1], x.shape[2]), lane_pack=_STEM_PACK
    ).astype(x.dtype)
    # filter grad via XLA's native transpose rule (DCE'd when params are not
    # differentiated, e.g. the frozen seg model inside guidance)
    _, pull = jax.vjp(
        lambda ww: jax.lax.conv_general_dilated(
            x, ww, (stride, stride), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ),
        w,
    )
    (dw,) = pull(g)
    return dx, dw


stem_conv.defvjp(_stem_fwd_vjp, _stem_bwd)
