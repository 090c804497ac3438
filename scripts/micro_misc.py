"""Microbench: resize fwd/bwd, CE fwd/bwd, per-step RNG — the non-matmul
slices of the guided-translate step.

Usage: python scripts/micro_misc.py
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

from weatherconverter_tpu.ops.image import resize_bilinear
from weatherconverter_tpu.training.losses import cross_entropy_loss

B = 8
gt = jax.random.randint(jax.random.PRNGKey(7), (B, 256, 256), 0, 19)


def timed(name, make_scan, Ks=(50, 200), reps=3):
    rows = []
    for K in Ks:
        f = jax.jit(make_scan(K))
        float(jnp.sum(f(jax.random.PRNGKey(99)).astype(jnp.float32)))
        best = 1e9
        for r in range(reps):
            kk = jax.random.PRNGKey(1000 + 7 * K + r)
            float(jnp.sum(kk))
            t0 = time.perf_counter()
            float(jnp.sum(f(kk).astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        rows.append((K, best))
    (k1, t1), (k2, t2) = rows[0], rows[-1]
    s_ms = (t2 - t1) / (k2 - k1) * 1000.0
    print(f"{name:34s} per-step={s_ms:7.3f} ms", flush=True)
    return s_ms


def resize_fwd(K):
    def run(key):
        x0 = jax.random.normal(key, (B, 64, 64, 19), jnp.bfloat16)
        def body(c, i):
            y = resize_bilinear(c, (256, 256))
            return c + 0.001 * y[:, ::4, ::4, :].astype(c.dtype), None
        return jax.lax.scan(body, x0, jnp.arange(K))[0]
    return run


def resize_grad(K):
    def run(key):
        x0 = jax.random.normal(key, (B, 64, 64, 19), jnp.bfloat16)
        def body(c, i):
            g = jax.grad(
                lambda z: jnp.sum(resize_bilinear(z, (256, 256)).astype(jnp.float32) ** 2)
            )(c)
            return c + 0.001 * g.astype(c.dtype), None
        return jax.lax.scan(body, x0, jnp.arange(K))[0]
    return run


def ce_grad(K):
    def run(key):
        x0 = jax.random.normal(key, (B, 256, 256, 19), jnp.float32)
        def body(c, i):
            g = jax.grad(lambda z: cross_entropy_loss(z, gt, ignore_index=255))(c)
            return c + 0.001 * g, None
        return jax.lax.scan(body, x0, jnp.arange(K))[0]
    return run


def rng_normal(K):
    def run(key):
        x0 = jnp.zeros((B, 128, 128, 3), jnp.float32)
        def body(c, i):
            c_x, k = c
            k, zk = jax.random.split(k)
            z = jax.random.normal(zk, c_x.shape, c_x.dtype)
            return (c_x * 0.999 + 0.001 * z, k), None
        return jax.lax.scan(body, (x0, key), jnp.arange(K))[0][0]
    return run


timed("resize 64->256 fwd (19ch)", resize_fwd)
timed("resize 64->256 grad", resize_grad)
timed("CE 256px 19ch fwd+bwd", ce_grad)
timed("rng split+normal 128px", rng_normal)
