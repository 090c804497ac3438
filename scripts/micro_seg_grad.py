"""Attribution microbench: where does the GSG seg fwd+bwd time go?

Times (scan-based, fresh keys, scalar readback — see PROFILE.md methodology):
  seg fwd                 — DeepLabV3+/R101 forward, 256px B=8
  seg input-grad          — jax.grad of CE wrt the input (the GSG op)
  stem data-grad (XLA)    — the isolated backward-to-input of the 7x7/s2
                            cin=3 stem: conv_transpose 64->3 at 256px. C_out=3
                            pays the MXU 128-lane padding tax (suspected
                            hidden cost of the seg backward).
  stem data-grad (packed) — same op as a shift-packed dense conv on the
                            lhs-dilated gradient (output channels carry a
                            4x8 grid of shifted output pixels -> 96/128 lanes).

Caveat: microbench deltas do not always transfer in situ on this backend
(PROFILE.md round 3) — any winner must be re-measured with
scripts/ab_translate.py before shipping.

Usage: python scripts/micro_seg_grad.py
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
from weatherconverter_tpu.models.factory import make_seg_model

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
            up = jnp.repeat(jnp.repeat(logits[..., :3], 1, 1), 1, 2)
            return c * 0.999 + 0.001 * up, None
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


# --- isolated stem data-grad: dx of conv7x7/s2 (3 -> 64) at 256px ---
KH = 7


def _stem_fwd(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (2, 2), ((3, 3), (3, 3)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def stem_dx_xla(K):
    def run(w_, key):
        g0 = jax.random.normal(key, (B, HR // 2, HR // 2, 64), dt)
        x0 = jnp.zeros((B, HR, HR, 3), dt)
        _, pull = jax.vjp(lambda xx: _stem_fwd(xx, w_), x0)

        def body(c, i):
            (dx,) = pull(c)  # (B, 256, 256, 3) — the op autodiff emits
            pooled = jnp.mean(dx.reshape(B, HR // 2, 2, HR // 2, 2, 3), axis=(2, 4))
            return c * 0.999 + 0.001 * jnp.pad(pooled, ((0, 0),) * 3 + ((0, 61),)).astype(c.dtype), None
        return jax.lax.scan(body, g0, jnp.arange(K))[0]
    return run


def stem_dx_packed(K):
    w = jax.random.normal(jax.random.PRNGKey(11), (KH, KH, 3, 64), dt) * 0.05
    SH, SW = 4, 8

    def run(w_, key):
        g0 = jax.random.normal(key, (B, HR // 2, HR // 2, 64), dt)

        # dx[p] = sum_t g_dil[p + t] * wflip[t]  (VALID conv on the
        # lhs-dilated, padded gradient with the transposed/flipped kernel,
        # 64 -> 3) — shift-packed so C_out' = SH*SW*3 = 96 lanes.
        wflip = jnp.flip(w_, (0, 1)).transpose(0, 1, 3, 2)  # (7,7,64,3)
        shifted = jnp.stack(
            [
                jnp.stack(
                    [jnp.pad(wflip, ((a, SH - 1 - a), (b, SW - 1 - b), (0, 0), (0, 0)))
                     for b in range(SW)], axis=0)
                for a in range(SH)
            ], axis=0)
        kp = shifted.transpose(2, 3, 4, 0, 1, 5).reshape(
            KH + SH - 1, KH + SW - 1, 64, SH * SW * 3
        )

        def body(c, i):
            gd = jnp.zeros((B, HR + KH - 1, HR + KH - 1, 64), c.dtype)
            gd = gd.at[:, 3:3 + HR:2, 3:3 + HR:2, :].set(c)
            y = jax.lax.conv_general_dilated(
                gd, kp, window_strides=(SH, SW), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            b_, hb, wb, _ = y.shape
            y = y.reshape(b_, hb, wb, SH, SW, 3)
            dx = y.transpose(0, 1, 3, 2, 4, 5).reshape(b_, hb * SH, wb * SW, 3)
            pooled = jnp.mean(dx.reshape(B, HR // 2, 2, HR // 2, 2, 3), axis=(2, 4))
            return c * 0.999 + 0.001 * jnp.pad(pooled, ((0, 0),) * 3 + ((0, 61),)).astype(c.dtype), None
        return jax.lax.scan(body, g0, jnp.arange(K))[0]
    return run


if __name__ == "__main__":
    # numerical check of packed vs the true autodiff data-grad
    w = jax.random.normal(jax.random.PRNGKey(1), (KH, KH, 3, 64), jnp.float32) * 0.1
    g = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 64), jnp.float32)
    _, pull = jax.vjp(lambda xx: _stem_fwd(xx, w), jnp.zeros((1, 32, 32, 3)))
    (ref,) = pull(g)
    SH, SW = 4, 8
    wflip = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)
    shifted = jnp.stack(
        [jnp.stack([jnp.pad(wflip, ((a, SH - 1 - a), (b, SW - 1 - b), (0, 0), (0, 0)))
                    for b in range(SW)], axis=0) for a in range(SH)], axis=0)
    kp = shifted.transpose(2, 3, 4, 0, 1, 5).reshape(KH + SH - 1, KH + SW - 1, 64, SH * SW * 3)
    HH = 32
    gd = jnp.zeros((1, HH + KH - 1, HH + KH - 1, 64), jnp.float32)
    gd = gd.at[:, 3:3 + HH:2, 3:3 + HH:2, :].set(g)
    y = jax.lax.conv_general_dilated(gd, kp, window_strides=(SH, SW), padding="VALID",
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b_, hb, wb, _ = y.shape
    dx = y.reshape(b_, hb, wb, SH, SW, 3).transpose(0, 1, 3, 2, 4, 5).reshape(b_, hb * SH, wb * SW, 3)
    print("packed-vs-ref max|diff|:", float(jnp.max(jnp.abs(dx - ref))), flush=True)

    timed("seg fwd", fwd_only, seg_vars)
    timed("seg input-grad", input_grad, seg_vars)
    w8 = jax.random.normal(jax.random.PRNGKey(11), (KH, KH, 3, 64), dt) * 0.05
    timed("stem data-grad (XLA)", stem_dx_xla, w8)
    timed("stem data-grad (packed)", stem_dx_packed, w8)
