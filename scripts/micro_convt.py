"""Microbench: transposed-conv forms on real TPU.

Compares the shipped lhs-dilated form (models/layers.py conv_transpose_torch)
against a subpixel decomposition: for k=4, s=2, p=1 each output-pixel parity
class (di, dj) in {0,1}^2 sees a fixed 2x2 sub-kernel, so the transposed conv
is exactly 4 stride-1 2x2 convs at INPUT resolution + depth-to-space — 1/4 of
the MACs of the dilated form if XLA does not strength-reduce the zeros.

Usage: python scripts/micro_convt.py [B]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

cache_dir = os.path.expanduser("~/.cache/jax_compcache")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from weatherconverter_tpu.models.layers import conv_transpose_torch

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
K = 50


def subpixel_conv_transpose(x, kernel, bias):
    """ConvTranspose2d(k=4, s=2, p=1) via subpixel decomposition.

    kernel layout (kh, kw, cout, cin) as in conv_transpose_torch.
    out[2i+di, 2j+dj] = sum_{a,b} x[i+?, j+?] K[...] — derive taps:
    output index o = 2i+d; conv_transpose: out[o] += x[m] * K[o - 2m + p_eff]
    with torch semantics out[o] = sum_m x[m] K[k-1 - (o - 2m + k-1-p)]... —
    easiest correct construction: slice the FLIPPED kernel used by the
    lhs-dilated form by parity. The dilated form computes, with
    pad = k-1-p = 2 and flipped kernel F (kh, kw, cin, cout):
      out[o_h, o_w] = sum_{u,v} xd[o_h + u - 2, o_w + v - 2] F[u, v]
    where xd is x dilated 2x (nonzero at even coords). For parity (dh, dw) of
    (o_h-? ...), the taps hit F[u, v] with (o_h + u) even — i.e. a 2x2
    sub-kernel per parity.
    """
    k = kernel.shape[0]
    flipped = kernel[::-1, ::-1].transpose(0, 1, 3, 2)  # (kh, kw, cin, cout)
    bh, hh, ww, cin = x.shape
    cout = kernel.shape[2]
    outs = {}
    for dh in range(2):
        for dw in range(2):
            # output row o = 2t + dh; dilated input nonzero at o + u - 2 even
            # -> u parity = dh (since o+u-2 even <=> u ≡ -o ≡ dh mod 2... o=2t+dh
            # so o+u-2 even <=> u+dh even <=> u parity == dh parity)
            us = [u for u in range(k) if (u + dh) % 2 == 0]
            vs = [v for v in range(k) if (v + dw) % 2 == 0]
            sub = flipped[jnp.array(us)][:, jnp.array(vs)]  # (2, 2, cin, cout)
            # input index m = (o + u - 2) / 2 = t + (dh + u - 2)/2
            # offsets (dh+u-2)/2 for u in us: for dh=0, us=[0,2]: -1, 0
            #                                  for dh=1, us=[1,3]: 0, 1
            off_h = [(dh + u - 2) // 2 for u in us]
            off_w = [(dw + v - 2) // 2 for v in vs]
            pad_h = (max(0, -off_h[0]), max(0, off_h[-1]))
            pad_w = (max(0, -off_w[0]), max(0, off_w[-1]))
            outs[(dh, dw)] = jax.lax.conv_general_dilated(
                x, sub, window_strides=(1, 1),
                padding=(pad_h, pad_w),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
    # interleave parities: (B, H, W, 4*cout) -> depth-to-space
    stacked = jnp.stack(
        [outs[(0, 0)], outs[(0, 1)], outs[(1, 0)], outs[(1, 1)]], axis=3
    )  # (B, H, W, 4, cout)
    out = stacked.reshape(bh, hh, ww, 2, 2, cout)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(bh, hh * 2, ww * 2, cout)
    if bias is not None:
        out = out + bias
    return out


def timed(name, fn, *args, reps=3):
    f = jax.jit(fn)
    float(jnp.sum(f(*args, jax.random.PRNGKey(99)).astype(jnp.float32)))
    best = 1e9
    for r in range(reps):
        kk = jax.random.PRNGKey(100 + r)
        float(jnp.sum(kk))
        t0 = time.perf_counter()
        float(jnp.sum(f(*args, kk).astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    ms = best / K * 1000.0
    print(f"{name:42s} {ms:8.3f} ms/step", flush=True)
    return ms


def main():
    dt = jnp.bfloat16
    shapes = [(16, 512), (32, 128), (64, 64)]  # (in_res, C) the UNet up path
    key = jax.random.PRNGKey(0)
    for res, c in shapes:
        kern = jax.random.normal(key, (4, 4, c, c), dt) * 0.05
        bias = jnp.zeros((c,), dt)
        x = jax.random.normal(key, (B, res, res, c), dt)

        # correctness
        a = conv_transpose_torch(x.astype(jnp.float32), kern.astype(jnp.float32), bias.astype(jnp.float32), 2, 1)
        bval = subpixel_conv_transpose(x.astype(jnp.float32), kern.astype(jnp.float32), bias.astype(jnp.float32))
        err = float(jnp.max(jnp.abs(a - bval)))
        print(f"res={res} C={c} max|diff|={err:.2e}", flush=True)

        def dilated(xx, kk_, bb, key):
            def body(c_, i):
                return conv_transpose_torch(c_, kk_, bb, 2, 1)[:, ::2, ::2, :] * 0.999, None
            return jax.lax.scan(body, xx, jnp.arange(K))[0]

        def subpix(xx, kk_, bb, key):
            def body(c_, i):
                return subpixel_conv_transpose(c_, kk_, bb)[:, ::2, ::2, :] * 0.999, None
            return jax.lax.scan(body, xx, jnp.arange(K))[0]

        timed(f"dilated   res={res} C={c}", dilated, x, kern, bias)
        timed(f"subpixel  res={res} C={c}", subpix, x, kern, bias)


if __name__ == "__main__":
    main()
