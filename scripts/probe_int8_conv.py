"""Probe: does this backend's XLA lower int8xint8->int32 convolutions to
the MXU's double-rate int8 path, and at what speedup over bf16?

Shapes probed are the translate pipeline's hot convs:
  - SRGAN residual block conv: (B,128,128,64) x 3x3x64->64  (16 blocks/step)
  - UNet down0 conv:           (B,64,64,256) x 3x3x256->256 (approx ladder)
  - seg ResNet101 body conv:   (B,32,32,512) x 3x3x512->512

Feasibility + raw-rate only; any adoption decision is made by the in-situ
A/B on the full jitted translate (scripts/ab_translate.py) per CLAUDE.md
rule 2.

Run on the real chip: python scripts/probe_int8_conv.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

SHAPES = [
    ("srgan_res", (8, 128, 128, 64), (3, 3, 64, 64)),
    ("unet_mid", (8, 64, 64, 256), (3, 3, 256, 256)),
    ("seg_body", (8, 32, 32, 512), (3, 3, 512, 512)),
]


def conv(x, w, out_t):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_t,
    )


def timeit(fn, *args, reps=20):
    r = fn(*args)
    float(jnp.sum(r.astype(jnp.float32)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*args)
        float(jnp.sum(r.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3


def main():
    key = jax.random.PRNGKey(0)
    for name, xs, ws in SHAPES:
        xf = jax.random.normal(key, xs, dtype=jnp.bfloat16)
        wf = jax.random.normal(jax.random.fold_in(key, 1), ws, dtype=jnp.bfloat16)
        x8 = (xf.astype(jnp.float32) * 20).astype(jnp.int8)
        w8 = (wf.astype(jnp.float32) * 20).astype(jnp.int8)

        tb = timeit(jax.jit(lambda a, b: conv(a, b, jnp.float32)), xf, wf)
        try:
            t8 = timeit(jax.jit(lambda a, b: conv(a, b, jnp.int32)), x8, w8)
            print(f"{name}: bf16 {tb:.3f} ms  int8 {t8:.3f} ms  "
                  f"speedup {tb / t8:.2f}x")
        except Exception as e:
            print(f"{name}: bf16 {tb:.3f} ms  int8 FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}")

        # mixed int8-weight/bf16-activation (weight-only quant: halves weight
        # HBM only — relevant for the 512-ch seg convs)
        try:
            tm = timeit(
                jax.jit(lambda a, b: conv(a, b.astype(jnp.bfloat16), jnp.float32)),
                xf, w8,
            )
            print(f"  weight-only-int8 (dequant in-graph): {tm:.3f} ms")
        except Exception as e:
            print(f"  weight-only-int8 FAILED: {str(e)[:120]}")


if __name__ == "__main__":
    main()
