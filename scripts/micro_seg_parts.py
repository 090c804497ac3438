"""Attribution round 2: remaining pieces of the GSG step after the packed
stem backward (PROFILE.md round 3).

Pieces timed on the real chip (scan harness, fresh keys, scalar readback):
  seg fwd / seg input-grad      — as micro_seg_grad.py, now with packed stem
  maxpool3x3s2 bwd              — vjp of the stem max-pool at 128px, B=8
                                  (XLA lowers to SelectAndScatter — suspected)
  ce+resize fwd+bwd             — vjp of [bilinear 64->256 logits upsample,
                                  CE(ignore=255)] — the guidance loss block
  unet convout fwd              — dense 3x3 64->3 at 128px (narrow-out tax)
  unet convout packed           — same, shift-packed 4x8

Usage: python scripts/micro_seg_parts.py
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

from weatherconverter_tpu.guidance.sgg import seg_input_gradients
from weatherconverter_tpu.models.backbones.resnet import max_pool_3x3_s2
from weatherconverter_tpu.models.factory import make_seg_model
from weatherconverter_tpu.ops.packed_conv import shift_packed_conv
from weatherconverter_tpu.training.losses import cross_entropy_loss

B, HR = 8, 256
dt = jnp.bfloat16
seg = make_seg_model("deeplabv3plus_resnet101", num_classes=19, train=False, dtype=dt)
seg_vars = jax.jit(seg.init)(jax.random.PRNGKey(3), jnp.zeros((1, HR, HR, 3)))
gt = jax.random.randint(jax.random.PRNGKey(7), (B, HR, HR), 0, 19)


def timed(name, make_fn, params, K=30, reps=3):
    f = jax.jit(make_fn(K))
    float(jnp.sum(f(params, jax.random.PRNGKey(999)).astype(jnp.float32)))
    best = 1e9
    for r in range(reps):
        kk = jax.random.PRNGKey(1000 + r)
        float(jnp.sum(kk))
        t0 = time.perf_counter()
        float(jnp.sum(f(params, kk).astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    ms = best / K * 1000.0
    print(f"{name:26s} {ms:9.3f} ms/step", flush=True)
    return ms


def fwd_only(K):
    def run(v, key):
        x0 = jax.random.normal(key, (B, HR, HR, 3))
        def body(c, i):
            logits = seg.apply(v, c)
            return c * 0.999 + 0.001 * logits[..., :3], None
        return jax.lax.scan(body, x0, jnp.arange(K))[0]
    return run


def input_grad(K):
    def run(v, key):
        x0 = jax.random.normal(key, (B, HR, HR, 3))
        def body(c, i):
            g = seg_input_gradients(lambda im: seg.apply(v, im), c, gt)
            return c * 0.999 + 0.001 * g, None
        return jax.lax.scan(body, x0, jnp.arange(K))[0]
    return run


def maxpool_bwd(K):
    def run(_, key):
        x0 = jax.random.normal(key, (B, 128, 128, 64), dt)
        def body(c, i):
            _, pull = jax.vjp(max_pool_3x3_s2, c)
            (dx,) = pull(c[:, ::2, ::2, :])
            return c * 0.999 + 0.001 * dx, None
        return jax.lax.scan(body, x0, jnp.arange(K))[0]
    return run


def ce_resize_bwd(K):
    def run(_, key):
        x0 = jax.random.normal(key, (B, 64, 64, 19), dt)
        def loss(lg):
            up = jax.image.resize(lg.astype(jnp.float32), (B, HR, HR, 19), "bilinear")
            return cross_entropy_loss(up, gt, ignore_index=255)
        def body(c, i):
            g = jax.grad(loss)(c)
            return c * 0.999 + 0.001 * g.astype(c.dtype), None
        return jax.lax.scan(body, x0, jnp.arange(K))[0]
    return run


def convout_plain(K):
    w = jax.random.normal(jax.random.PRNGKey(5), (3, 3, 64, 3), dt) * 0.1

    def run(w_, key):
        x0 = jax.random.normal(key, (B, 128, 128, 64), dt)
        def body(c, i):
            y = jax.lax.conv_general_dilated(
                c, w_, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return c * 0.999 + 0.001 * jnp.pad(y, ((0, 0),) * 3 + ((0, 61),)), None
        return jax.lax.scan(body, x0, jnp.arange(K))[0]
    return run


def convout_packed(K):
    w = jax.random.normal(jax.random.PRNGKey(5), (3, 3, 64, 3), dt) * 0.1

    def run(w_, key):
        x0 = jax.random.normal(key, (B, 128, 128, 64), dt)
        def body(c, i):
            xp = jnp.pad(c, ((0, 0), (1, 1), (1, 1), (0, 0)))
            y = shift_packed_conv(xp, w_, 4, 8)
            return c * 0.999 + 0.001 * jnp.pad(y, ((0, 0),) * 3 + ((0, 61),)), None
        return jax.lax.scan(body, x0, jnp.arange(K))[0]
    return run


if __name__ == "__main__":
    timed("seg fwd", fwd_only, seg_vars)
    timed("seg input-grad", input_grad, seg_vars)
    timed("maxpool3x3s2 bwd", maxpool_bwd, None)
    timed("ce+resize fwd+bwd", ce_resize_bwd, None)
    w = jax.random.normal(jax.random.PRNGKey(5), (3, 3, 64, 3), dt) * 0.1
    timed("unet convout fwd (plain)", convout_plain, w)
    timed("unet convout fwd (packed)", convout_packed, w)
