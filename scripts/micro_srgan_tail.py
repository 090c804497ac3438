"""Microbench: SRGAN tail (SeparableConv 9x9, 64->3, 256px) strategies.

  factorized — depthwise 9x9 (feature_group_count=64) + pointwise 1x1
               (the shipped path; XLA lowers the grouped conv on VPU)
  tapmatmul  — one MXU matmul x @ W (64 -> 81*3 tap-channels), where
               W[(dh,dw),ci,co] = dw9x9[dh,dw,ci] * pw[ci,co], followed by a
               shifted-sum over the 81 tap planes. Identical math up to fp
               reassociation; trades grouped-conv VPU work for one dense
               matmul + one bandwidth pass over the (HW, 243) tap tensor.

MEASURED (v5e, B=8): standalone, tapmatmul wins 6.1 vs 22.8 ms/step — but
wired into the real Generator it REGRESSED the end-to-end headline 17.9 ->
15.6 translations/min (in situ, XLA fuses the factorized tail with its
surrounding ops far better than this isolated scan suggests, and the (HW+8)^2
x k*k*C_out tap tensor adds an HBM pass the microbench under-weights). The
tap form was reverted. Kept as the canonical example of why microbench wins
on this backend must be confirmed in situ before shipping.

Usage: python scripts/micro_srgan_tail.py
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

B, HW, CIN, COUT, K = 8, 256, 64, 3, 9
P = K // 2


def factorized(x, dw, dwb, pw, pwb):
    h = jax.lax.conv_general_dilated(
        x, dw, (1, 1), ((P, P), (P, P)),
        feature_group_count=CIN, dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + dwb
    return jax.lax.conv_general_dilated(
        h, pw, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + pwb


def tapmatmul(x, dw, dwb, pw, pwb):
    # W_all: (CIN, K*K*COUT); tap (dh,dw) block = dw[dh,dw,ci] * pw[ci,co]
    w = dw[:, :, 0, :, None] * pw[0, 0][None, None]          # (K, K, CIN, COUT)
    w_all = w.transpose(2, 0, 1, 3).reshape(CIN, K * K * COUT)
    xp = jnp.pad(x, ((0, 0), (P, P), (P, P), (0, 0)))
    y = xp.reshape(-1, CIN) @ w_all                            # (B*(HW+8)^2, 243)
    y = y.reshape(B, HW + 2 * P, HW + 2 * P, K * K, COUT)
    out = jnp.zeros((B, HW, HW, COUT), y.dtype)
    for dh in range(K):
        for dwi in range(K):
            out = out + y[:, dh:dh + HW, dwi:dwi + HW, dh * K + dwi]
    bias = pwb + dwb @ pw[0, 0]
    return out + bias


def timed(name, fn, args, Ks=(20, 80), reps=3):
    rows = []
    for K_ in Ks:
        def scan_fn(a, key):
            x0 = a[0]
            def body(c, i):
                y = fn(c, *a[1:])
                up = jnp.pad(y, ((0, 0), (0, 0), (0, 0), (0, CIN - COUT)))
                return c * 0.999 + 0.001 * up.astype(c.dtype), None
            return jax.lax.scan(body, x0, jnp.arange(K_))[0]

        f = jax.jit(scan_fn)
        float(jnp.sum(f(args, jax.random.PRNGKey(9)).astype(jnp.float32)))
        best = 1e9
        for r in range(reps):
            kk = jax.random.PRNGKey(10 + 7 * K_ + r)
            float(jnp.sum(kk))
            t0 = time.perf_counter()
            float(jnp.sum(f(args, kk).astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        rows.append((K_, best))
    (k1, t1), (k2, t2) = rows[0], rows[-1]
    s_ms = (t2 - t1) / (k2 - k1) * 1000.0
    print(f"{name:22s} per-step={s_ms:7.3f} ms", flush=True)
    return s_ms


def main():
    on_tpu = jax.default_backend() == "tpu"
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (B, HW, HW, CIN), dt)
    dw = jax.random.normal(ks[1], (K, K, 1, CIN), dt) * 0.05
    dwb = jax.random.normal(ks[2], (CIN,), dt) * 0.05
    pw = jax.random.normal(ks[3], (1, 1, CIN, COUT), dt) * 0.1
    pwb = jax.random.normal(ks[4], (COUT,), dt) * 0.1

    f32 = lambda a: a.astype(jnp.float32)
    a = factorized(f32(x), f32(dw), f32(dwb), f32(pw), f32(pwb))
    b = tapmatmul(f32(x), f32(dw), f32(dwb), f32(pw), f32(pwb))
    print(f"max|diff| (f32): {float(jnp.max(jnp.abs(a - b))):.3e}", flush=True)

    if on_tpu:
        args = (x, dw, dwb, pw, pwb)
        timed("factorized", factorized, args)
        timed("tapmatmul", tapmatmul, args)


if __name__ == "__main__":
    main()
