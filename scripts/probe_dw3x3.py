"""Mosaic feasibility probe: 3x3 depthwise conv on (B, 128, 128, 64) NHWC
via in-kernel sublane shifts (W = second-to-minor dim, C = lanes).

The round-2 9x9 depthwise kernel crashed the server-side Mosaic compiler at
W=256 in every variant; this probes whether the 3x3 case at W=128 (the SRGAN
residual-block shape) compiles and how it performs — gate for building the
fused residual-block kernel.

Usage: python scripts/probe_dw3x3.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

cache_dir = os.path.expanduser("~/.cache/jax_compcache")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, H, W, C = 8, 128, 128, 64
TH = 32  # rows per program
WP = W + 8  # padded width: data at cols [1, 129), aligned to 8


def _kernel(x_ref, k_ref, o_ref):
    # x block: (1, TH+2, WP, C); k: (16, C) rows 0..8 = taps (pad unused)
    x = x_ref[0]
    k = k_ref[...]
    acc = jnp.zeros((TH, WP - 8, C), jnp.float32)
    for dh in range(3):
        for dw in range(3):
            sl = x[dh:dh + TH, dw:dw + WP - 8, :].astype(jnp.float32)
            acc = acc + sl * k[dh * 3 + dw][None, None, :].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def dw3x3(xp, kv):
    # xp: (B, H+2, WP, C) zero-padded; kv: (9->8 padded rows, C)
    grid = (B, H // TH)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, WP - 8, C), xp.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TH + 2, WP, C), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, C), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH, WP - 8, C), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() not in ("tpu",),
    )(xp, kv)


def main():
    on_tpu = jax.default_backend() == "tpu"
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), dt)
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 1, C), dt) * 0.2

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 4 + 3), (0, 0)))  # W: 1 left, 7 right
    kv = jnp.pad(k.reshape(9, C), ((0, 7), (0, 0)))

    ref = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), k.astype(jnp.float32), (1, 1), ((1, 1), (1, 1)),
        feature_group_count=C, dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    try:
        out = dw3x3(xp, kv)[:, :, : W, :]
    except Exception as e:
        print(f"COMPILE/RUN FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
        return
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
    print(f"max|diff| vs XLA: {err:.3e}", flush=True)

    if not on_tpu:
        return

    def scan_fn(args, key):
        xp_, kv_ = args
        def body(c, i):
            y = dw3x3(c, kv_)
            c2 = c.at[:, 1:-1, : W, :].set(c[:, 1:-1, : W, :] * 0.99 + 0.01 * y)
            return c2, None
        return jax.lax.scan(body, xp_, jnp.arange(50))[0]

    f = jax.jit(scan_fn)
    float(jnp.sum(f((xp, kv), jax.random.PRNGKey(9)).astype(jnp.float32)))
    best = 1e9
    for r in range(3):
        kk = jax.random.PRNGKey(10 + r)
        float(jnp.sum(kk))
        t0 = time.perf_counter()
        float(jnp.sum(f((xp, kv), kk).astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"pallas dw3x3: {best / 50 * 1000:.3f} ms/iter", flush=True)

    # XLA grouped-conv comparison in the same harness
    def scan_x(args, key):
        x_, k_ = args
        def body(c, i):
            y = jax.lax.conv_general_dilated(
                c, k_, (1, 1), ((1, 1), (1, 1)), feature_group_count=C,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return c * 0.99 + 0.01 * y, None
        return jax.lax.scan(body, x_, jnp.arange(50))[0]

    fx = jax.jit(scan_x)
    float(jnp.sum(fx((x, k), jax.random.PRNGKey(9)).astype(jnp.float32)))
    best = 1e9
    for r in range(3):
        kk = jax.random.PRNGKey(20 + r)
        float(jnp.sum(kk))
        t0 = time.perf_counter()
        float(jnp.sum(fx((x, k), kk).astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"xla grouped dw3x3: {best / 50 * 1000:.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
