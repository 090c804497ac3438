"""Microbench: LCG (19-class masked seg grads) chunk-size sweep on v5e.

The reference's LCG does 19 masked seg fwd+bwd per even step (sgg.py:27-60) —
irreducible work; what's tunable is how many class-masked copies batch into
one seg call (class_chunk) and whether each chunk is rematerialized.

MEASURED (v5e, B=8, 256px, R101): flat. chunk=4/10/19 and remat on/off all
land at ~116 ms/step (chunk=8 is an outlier at 151 — bad pad to 24 classes);
the 19 masked seg fwd+bwds are compute-bound, so neither activation-memory
strategy nor microbatch width moves the needle. The shipped default
(class_chunk=4 + per-chunk jax.checkpoint) is kept for its lower HBM
footprint; a `remat` knob was prototyped and dropped after this sweep.

Usage: python scripts/micro_lcg.py
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

from weatherconverter_tpu.guidance import sgg
from weatherconverter_tpu.models.factory import make_seg_model

B, HR = 8, 256
dt = jnp.bfloat16
seg = make_seg_model("deeplabv3plus_resnet101", num_classes=19, train=False, dtype=dt)
seg_vars = jax.jit(seg.init)(jax.random.PRNGKey(3), jnp.zeros((1, HR, HR, 3)))
gt = jax.random.randint(jax.random.PRNGKey(7), (B, HR, HR), 0, 19)


def timed(name, chunk, Ks=(4, 12), reps=2):
    rows = []
    for K in Ks:
        def run(v, key):
            x0 = jax.random.normal(key, (B, HR, HR, 3))
            mu = jnp.zeros((B, 128, 128, 3), jnp.float32)
            sig = jnp.ones((1, 1, 1, 1), jnp.float32)
            def body(c, i):
                y = sgg.apply_lcg(
                    lambda im: seg.apply(v, im), mu, sig, c, gt, 60.0,
                    num_classes=19, noise=None, mode="fixed",
                    class_chunk=chunk,
                )
                return c * 0.999 + 0.001 * jnp.repeat(jnp.repeat(y, 2, 1), 2, 2), None
            return jax.lax.scan(body, x0, jnp.arange(K))[0]

        f = jax.jit(run)
        try:
            float(jnp.sum(f(seg_vars, jax.random.PRNGKey(99)).astype(jnp.float32)))
        except Exception as e:
            print(f"{name:30s} FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)
            return None
        best = 1e9
        for r in range(reps):
            kk = jax.random.PRNGKey(1000 + 7 * K + r)
            float(jnp.sum(kk))
            t0 = time.perf_counter()
            float(jnp.sum(f(seg_vars, kk).astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        rows.append((K, best))
    (k1, t1), (k2, t2) = rows[0], rows[-1]
    s_ms = (t2 - t1) / (k2 - k1) * 1000.0
    print(f"{name:30s} per-step={s_ms:9.3f} ms", flush=True)
    return s_ms


for chunk in (4, 10, 19):
    timed(f"lcg chunk={chunk}", chunk)
