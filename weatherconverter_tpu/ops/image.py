"""On-device image primitives (NHWC): resize, pooling, pixel shuffle.

Replaces the reference's host-side torchvision/PIL transforms and
`F.avg_pool2d` / `F.interpolate` calls with jittable jnp/lax ops so the whole
guided-sampling loop (reference: translation.py:70-90) stays on device.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def resize_bilinear(
    x: jax.Array, size: tuple[int, int], antialias: bool = False
) -> jax.Array:
    """Bilinear resize with half-pixel centers (torch align_corners=False /
    PIL semantics; reference uses F.interpolate(..., mode='bilinear',
    align_corners=False) at seg_model/network/utils.py and _deeplab.py:50).

    Set antialias=True to match PIL/torchvision's antialiased `Resize` used in
    the host preprocessing pipelines (reference: dataloader.py:57,
    seg inference.py:77)."""
    n, h, w, c = x.shape
    return jax.image.resize(
        x, (n, size[0], size[1], c), method="bilinear", antialias=antialias
    )


def resize_nearest(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, size[0], size[1], c), method="nearest")


def avg_pool(x: jax.Array, window: int, stride: int | None = None) -> jax.Array:
    """NHWC average pool (reference: F.avg_pool2d(kernel_size=4, stride=4) at
    sgg/sgg.py:18,49 and nn.AvgPool2d(2) at old_modules.py:185)."""
    stride = stride or window
    out = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )
    return out / float(window * window)


def global_avg_pool(x: jax.Array, keepdims: bool = True) -> jax.Array:
    """AdaptiveAvgPool2d(1) equivalent (reference: _deeplab.py:123)."""
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)


def adaptive_avg_pool(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """AdaptiveAvgPool2d((oh, ow)) for the SRGAN discriminator head
    (reference: srgan_model/models.py:129). Assumes H % oh == 0 case falls out
    exactly; otherwise uses torch's floor/ceil bin edges."""
    n, h, w, c = x.shape
    oh, ow = out_hw
    if h % oh == 0 and w % ow == 0:
        return avg_pool(x, window=h // oh, stride=h // oh) if h // oh == w // ow else \
            jnp.mean(
                x.reshape(n, oh, h // oh, ow, w // ow, c), axis=(2, 4)
            )
    # General case: torch bins [floor(i*h/oh), ceil((i+1)*h/oh))
    rows = [(int(i * h // oh), int(-(-(i + 1) * h // oh))) for i in range(oh)]
    cols = [(int(j * w // ow), int(-(-(j + 1) * w // ow))) for j in range(ow)]
    out = jnp.stack(
        [
            jnp.stack(
                [jnp.mean(x[:, r0:r1, c0:c1, :], axis=(1, 2)) for (c0, c1) in cols],
                axis=1,
            )
            for (r0, r1) in rows
        ],
        axis=1,
    )
    return out  # (N, oh, ow, C)


def pixel_shuffle(x: jax.Array, factor: int) -> jax.Array:
    """Depth-to-space, torch nn.PixelShuffle semantics (reference:
    srgan_model/models.py:44). Input NHWC with C = c_out * factor^2, channel
    ordering (c_out, fh, fw) to match torch's NCHW PixelShuffle when weights
    are imported."""
    n, h, w, c = x.shape
    r = factor
    co = c // (r * r)
    x = x.reshape(n, h, w, co, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, r, w, r, co
    return x.reshape(n, h * r, w * r, co)


def center_crop(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Center crop NHWC (torchvision CenterCrop semantics: offset =
    int(round((in - out)/2.0)) with Python banker's rounding — differs from
    floor division by one pixel when (in-out) % 4 == 3)."""
    n, h, w, c = x.shape
    th, tw = size
    top = int(round((h - th) / 2.0))
    left = int(round((w - tw) / 2.0))
    return x[:, top : top + th, left : left + tw, :]


def normalize(x: jax.Array, mean: Sequence[float], std: Sequence[float]) -> jax.Array:
    """Channel-wise (x - mean) / std, NHWC (reference: ExtNormalize)."""
    m = jnp.asarray(mean, dtype=x.dtype)
    s = jnp.asarray(std, dtype=x.dtype)
    return (x - m) / s


def denormalize(x: jax.Array, mean: Sequence[float], std: Sequence[float]) -> jax.Array:
    """Inverse of `normalize` (reference: seg_model/utils/utils.py:17-28)."""
    m = jnp.asarray(mean, dtype=x.dtype)
    s = jnp.asarray(std, dtype=x.dtype)
    return x * s + m
