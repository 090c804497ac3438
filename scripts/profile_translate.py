"""Per-component cost breakdown of the guided-translate step on real TPU.

Each component is timed as a jitted lax.scan over K iterations at batch B,
with a FRESH rng-key argument per timed call (the remote TPU backend caches
results of identical (program, args) pairs — repeat-timing with fixed args
measures round-trip latency, not compute).

Usage: python scripts/profile_translate.py [B] [K]
"""

from __future__ import annotations

import json
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

from weatherconverter_tpu.core.config import UnetModelConfig
from weatherconverter_tpu.diffusion.schedule import linear_schedule
from weatherconverter_tpu.guidance.sgg import apply_gsg, apply_lcg
from weatherconverter_tpu.guidance.translate import sample_with_sgg
from weatherconverter_tpu.models.factory import make_seg_model
from weatherconverter_tpu.models.srgan import Generator
from weatherconverter_tpu.models.unet import Unet

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
K = int(sys.argv[2]) if len(sys.argv) > 2 else 50
H, SR = 128, 2
HR = H * SR

dev = jax.devices()[0]
on_tpu = dev.platform in ("tpu", "axon")
dtype = jnp.bfloat16 if on_tpu else jnp.float32
print(f"device={dev} dtype={dtype.__name__} B={B} K={K}", file=sys.stderr)

ucfg = UnetModelConfig()
unet = Unet(config=ucfg, fused=on_tpu, dtype=dtype)
sched = linear_schedule(1000)
uparams = jax.jit(unet.init)(
    jax.random.PRNGKey(0), jnp.zeros((1, H, H, 3)), jnp.zeros((1,), jnp.int32)
)["params"]
seg = make_seg_model("deeplabv3plus_resnet101", num_classes=19, train=False, dtype=dtype)
seg_vars = jax.jit(seg.init)(jax.random.PRNGKey(3), jnp.zeros((1, HR, HR, 3)))
gen = Generator(upscale_factor=SR, dtype=dtype)
gvars = jax.jit(gen.init)(jax.random.PRNGKey(4), jnp.zeros((1, H, H, 3)))
gt = jax.random.randint(jax.random.PRNGKey(7), (B, HR, HR), 0, 19)


def timed(name, fn, params, k_steps=K, reps=3):
    """fn(params, key) -> array; params are jit ARGS (closures overflow the
    remote-compile request); fresh key per call defeats result caching, and a
    scalar READBACK (not block_until_ready, which does not actually block on
    the tunneled backend) forces execution before the clock stops."""
    f = jax.jit(fn)
    float(jnp.sum(f(params, jax.random.PRNGKey(999))))
    best = 1e9
    for r in range(reps):
        kk = jax.random.PRNGKey(1000 + r)
        float(jnp.sum(kk))
        t0 = time.perf_counter()
        float(jnp.sum(f(params, kk)))
        best = min(best, time.perf_counter() - t0)
    ms = best / k_steps * 1000.0
    print(f"{name:26s} {ms:9.3f} ms/step", file=sys.stderr)
    return ms


results = {}


def unet_scan(p, key):
    x0 = jax.random.normal(key, (B, H, H, 3))
    def body(c, i):
        eps = unet.apply({"params": p}, c, jnp.full((B,), i, jnp.int32))
        return (c - sched.betas[i] * eps) * 0.999, None
    return jax.lax.scan(body, x0, jnp.arange(K - 1, -1, -1))[0]

results["unet"] = timed("unet fwd", unet_scan, uparams)


def sr_scan(p, key):
    x0 = jax.random.normal(key, (B, H, H, 3))
    def body(c, i):
        y = gen.apply(p, c)
        return c * 0.999 + 0.001 * y[:, ::SR, ::SR, :], None
    return jax.lax.scan(body, x0, jnp.arange(K))[0]

results["srgan"] = timed("srgan fwd 128->256", sr_scan, gvars)


def gsg_scan(p, key):
    x0 = jax.random.normal(key, (B, HR, HR, 3))
    mu = jnp.zeros((B, H, H, 3), jnp.float32)
    sig = jnp.ones((1, 1, 1, 1), jnp.float32)
    def body(c, i):
        seg_fn = lambda im: seg.apply(p, im)
        y = apply_gsg(seg_fn, mu, sig, c, gt, 60.0, noise=None, mode="fixed")
        return c * 0.999 + 0.001 * jnp.repeat(jnp.repeat(y, SR, 1), SR, 2), None
    return jax.lax.scan(body, x0, jnp.arange(K))[0]

results["gsg"] = timed("gsg seg fwd+bwd", gsg_scan, seg_vars)

KL = max(K // 10, 2)

def lcg_scan(p, key):
    x0 = jax.random.normal(key, (B, HR, HR, 3))
    mu = jnp.zeros((B, H, H, 3), jnp.float32)
    sig = jnp.ones((1, 1, 1, 1), jnp.float32)
    def body(c, i):
        seg_fn = lambda im: seg.apply(p, im)
        y = apply_lcg(seg_fn, mu, sig, c, gt, 60.0, num_classes=19, noise=None, mode="fixed")
        return c * 0.999 + 0.001 * jnp.repeat(jnp.repeat(y, SR, 1), SR, 2), None
    return jax.lax.scan(body, x0, jnp.arange(KL))[0]

results["lcg"] = timed("lcg 19x seg fwd+bwd", lcg_scan, seg_vars, k_steps=KL)


def full(style):
    def run(params, key):
        up_, sv_, gv_ = params
        k1, k2 = jax.random.split(key)
        inp = jax.random.normal(k1, (B, H, H, 3)) * 0.2
        return sample_with_sgg(
            lambda xt, tt: unet.apply({"params": up_}, xt, tt),
            sched,
            lambda im: seg.apply(sv_, im),
            lambda im: gen.apply(gv_, im),
            inp, gt, k2,
            lam=60.0, num_steps=K, num_classes=19, mode="fixed",
            start_t=K - 1, guidance_style=style,
        )
    return run

allp = (uparams, seg_vars, gvars)
results["full_none"] = timed("FULL style=none", full("none"), allp)
results["full_gsg"] = timed("FULL style=gsg", full("gsg"), allp)
if os.environ.get("PROF_ALT") == "1":
    results["full_alternate"] = timed("FULL style=alternate", full("alternate"), allp)

print(json.dumps({k: round(v, 3) for k, v in results.items()}))
