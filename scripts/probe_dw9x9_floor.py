"""Measured refutation probe for the W-tiled Mosaic depthwise-9x9 retry
(VERDICT r1 item 1b).

A TPU depthwise conv cannot use the MXU (no shared contraction: each output
channel contracts only its own input channel — a diagonal kernel wastes
127/128 lanes), so ANY Mosaic depthwise kernel is VPU-bound at >= 81 FMAs
per output element. This probe MEASURES that bound at the SRGAN tail shape
((8, 256, 256, 64), the 9x9 64->3 final_conv input) with a Pallas kernel
that performs exactly the depthwise FLOPs (81 in-VMEM FMA passes over the
W<=128-tiled block — the tiling the verdict asked to retry; halos change
memory offsets, not the pass count or rate), and compares it against what
the shipped shift-packed MXU form (models/srgan.py:_shift_packed) costs for
the SAME layer, scan-amortized.

If the VPU bound alone exceeds the shift-pack's full cost, no W-tiled
depthwise kernel can win, crash or no crash.

Run on the real chip: python scripts/probe_dw9x9_floor.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, HW, C = 8, 256, 64
K = 9
WB = 128  # W-tile width (the <=128 retry)
HB = 32
REPS = 30


def dw_vpu_kernel(x_ref, w_ref, o_ref):
    """81 shifted-FMA passes over an (HB, WB, C) block — the exact VPU work
    of a depthwise 9x9 (shifts elided: same op count, same operand sizes)."""
    x = x_ref[0]
    acc = jnp.zeros_like(x, dtype=jnp.float32)
    for i in range(K * K):
        acc = acc + x.astype(jnp.float32) * w_ref[i]
    o_ref[0] = acc.astype(o_ref.dtype)


def run_vpu(x, w):
    grid = (B, HW // HB, HW // WB)
    return pl.pallas_call(
        dw_vpu_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, HB, WB, C), lambda b, i, j: (b, i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K * K,), lambda b, i, j: (0,), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, HB, WB, C), lambda b, i, j: (b, i, j, 0), memory_space=pltpu.VMEM),
    )(x, w)


def shift_pack_layer():
    from weatherconverter_tpu.models.srgan import SeparableConv

    mod = SeparableConv(3, 9, 1, 4, dtype=jnp.bfloat16)
    x0 = jnp.zeros((B, HW, HW, C), jnp.bfloat16)
    vs = mod.init(jax.random.PRNGKey(0), x0)
    return mod, vs


def timeit_scan(step, x, reps=REPS):
    @jax.jit
    def loop(x):
        def body(c, _):
            y = step(c)
            # fold the (possibly narrower) output back into the carry shape
            c2 = c * 0.999 + jnp.mean(y.astype(jnp.float32)).astype(c.dtype)
            return c2, 0.0
        c, _ = jax.lax.scan(body, x, None, length=reps)
        return c

    r = loop(x)
    float(jnp.sum(r.astype(jnp.float32)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = loop(x)
        float(jnp.sum(r.astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best / reps * 1e3


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, HW, HW, C), dtype=jnp.bfloat16)
    w = jnp.linspace(0.9, 1.1, K * K, dtype=jnp.float32)

    try:
        t_vpu = timeit_scan(lambda c: run_vpu(c, w), x)
        gf = B * HW * HW * C * K * K * 2 / 1e9
        print(f"VPU depthwise bound (81-FMA Pallas, W-tile {WB}): "
              f"{t_vpu:.3f} ms  ({gf / t_vpu:.1f} TFLOP/s VPU rate)")
    except Exception as e:
        print(f"VPU-bound kernel FAILED to compile/run: {type(e).__name__}: "
              f"{str(e)[:300]}")
        t_vpu = None

    mod, vs = shift_pack_layer()
    t_sp = timeit_scan(lambda c: mod.apply(vs, c), x)
    print(f"shift-packed full tail layer (dw+pw as one MXU conv): {t_sp:.3f} ms")
    if t_vpu is not None:
        print(f"verdict: VPU bound {'EXCEEDS' if t_vpu > t_sp else 'is below'} "
              f"the shipped tail cost -> W-tiled depthwise "
              f"{'REFUTED' if t_vpu > t_sp else 'still plausible'}")


if __name__ == "__main__":
    main()
