"""Probe: int8 x int8 -> int32 MXU dot inside a Pallas kernel on this
backend's Mosaic compiler (VERDICT r1 next-round item 1a). Also times a
bf16 equivalent of the same shape for the raw-rate comparison.

Run on the real chip: python scripts/probe_int8_dot.py
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

N, D, BQ = 4096, 64, 512
BATCH = 1  # keep the probe's HBM output small (1 x N x N i32 = 67 MB)


def k_int8(q_ref, k_ref, o_ref):
    q = q_ref[0]  # (BQ, D) int8
    k = k_ref[0]  # (N, D) int8
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[0] = s


def k_bf16(q_ref, k_ref, o_ref):
    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = s


def build(kernel, in_dtype, out_dtype):
    grid = (BATCH, N // BQ)

    def run(q, k):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((BATCH, N, N), out_dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, BQ, D), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, D), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BQ, N), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        )(q, k)

    return jax.jit(run)


def timeit(fn, *args, reps=8):
    r = fn(*args)
    float(jnp.sum(r.astype(jnp.float32)))  # force
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
    qf = jax.random.normal(key, (BATCH, N, D), dtype=jnp.bfloat16)
    kf = jax.random.normal(jax.random.fold_in(key, 1), (BATCH, N, D), dtype=jnp.bfloat16)
    q8 = (qf.astype(jnp.float32) * 40).astype(jnp.int8)
    k8 = (kf.astype(jnp.float32) * 40).astype(jnp.int8)

    try:
        f8 = build(k_int8, jnp.int8, jnp.int32)
        t8 = timeit(f8, q8, k8)
        print(f"int8 QK^T (8x{N}x{N}, D={D}): {t8:.3f} ms -- COMPILES AND RUNS")
    except Exception as e:
        print(f"int8 kernel FAILED: {type(e).__name__}: {str(e)[:300]}")
        t8 = None

    fb = build(k_bf16, jnp.bfloat16, jnp.float32)
    tb = timeit(fb, qf, kf)
    print(f"bf16 QK^T same shape: {tb:.3f} ms")
    if t8:
        print(f"speedup int8/bf16: {tb / t8:.2f}x")


if __name__ == "__main__":
    main()
