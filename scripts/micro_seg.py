"""Microbench: seg fwd vs input-grad cost at 256px, with K-sweep calibration.

The tunneled backend adds a per-CALL overhead that varies with the day and
the output size; timing the same scan at two K values separates per-step
cost s from fixed overhead F (t_K = s + F/K).

Usage: python scripts/micro_seg.py [B]
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

from weatherconverter_tpu.guidance.sgg import seg_ce, seg_input_gradients
from weatherconverter_tpu.models.factory import make_seg_model

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
HR = 256
dt = jnp.bfloat16

seg = make_seg_model("deeplabv3plus_resnet101", num_classes=19, train=False, dtype=dt)
seg_vars = jax.jit(seg.init)(jax.random.PRNGKey(3), jnp.zeros((1, HR, HR, 3)))
gt = jax.random.randint(jax.random.PRNGKey(7), (B, HR, HR), 0, 19)


def timed(name, make_scan, Ks=(50, 200), reps=3):
    rows = []
    for K in Ks:
        f = jax.jit(make_scan(K))
        float(jnp.sum(f(seg_vars, jax.random.PRNGKey(99)).astype(jnp.float32)))
        best = 1e9
        for r in range(reps):
            kk = jax.random.PRNGKey(1000 + 7 * K + r)
            float(jnp.sum(kk))
            t0 = time.perf_counter()
            float(jnp.sum(f(seg_vars, kk).astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        rows.append((K, best))
    (k1, t1), (k2, t2) = rows[0], rows[-1]
    s = (t2 - t1) / (k2 - k1) * 1000.0 * k1 * k2 / (k1 * k2)  # not right; solve properly
    # t_K = s*K + F  (total seconds). Solve two equations.
    s_ms = (t2 - t1) / (k2 - k1) * 1000.0
    F_ms = (t1 - s_ms / 1000.0 * k1) * 1000.0
    print(f"{name:28s} per-step={s_ms:8.3f} ms  fixed={F_ms:8.1f} ms "
          f"(raw: {[f'{k}:{t/k*1000:.2f}' for k, t in rows]})", flush=True)
    return s_ms


def fwd_scan(K):
    def run(v, key):
        x0 = jax.random.normal(key, (B, HR, HR, 3))
        def body(c, i):
            y = seg.apply(v, c)
            return c * 0.999 + 0.001 * y[..., :3], None
        return jax.lax.scan(body, x0, jnp.arange(K))[0]
    return run


def grad_scan(K):
    def run(v, key):
        x0 = jax.random.normal(key, (B, HR, HR, 3))
        def body(c, i):
            g = seg_input_gradients(lambda im: seg.apply(v, im), c, gt)
            return c * 0.999 + 0.001 * g, None
        return jax.lax.scan(body, x0, jnp.arange(K))[0]
    return run


def grad_remat_scan(K):
    def run(v, key):
        x0 = jax.random.normal(key, (B, HR, HR, 3))
        segr = jax.checkpoint(lambda im: seg.apply(v, im))
        def body(c, i):
            g = jax.grad(lambda im: seg_ce(lambda z: segr(z), im, gt))(c)
            return c * 0.999 + 0.001 * g, None
        return jax.lax.scan(body, x0, jnp.arange(K))[0]
    return run


print(f"device={jax.devices()[0]} B={B}", file=sys.stderr)
timed("seg fwd", fwd_scan)
timed("seg input-grad", grad_scan)
timed("seg input-grad (remat)", grad_remat_scan, Ks=(50,))
