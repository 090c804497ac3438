"""In-situ A/B harness: time the FULL jitted guided-translate scan (style=gsg).

The tap-matmul episode (PROFILE.md round 3) proved microbench deltas do not
transfer on this backend — every candidate optimization gets timed HERE, on
the exact program bench.py ships, before it may land. Variants are toggled
by env flags read inside weatherconverter_tpu (set them before launch).

Usage: [WCTPU_*=...] python scripts/ab_translate.py [K] [B] [label] [style]
`style` is gsg (default, the headline) or alternate (even->LCG, the
reference's flagship schedule — use it for LCG-side A/Bs like
WCTPU_LCG_CLASS_CHUNK).
Prints: one line `label  ms/step  (extrap /min at 1000 steps)`.
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

from weatherconverter_tpu.core.config import UnetModelConfig
from weatherconverter_tpu.diffusion.schedule import linear_schedule
from weatherconverter_tpu.guidance.translate import sample_with_sgg
from weatherconverter_tpu.models.factory import make_seg_model
from weatherconverter_tpu.models.srgan import Generator
from weatherconverter_tpu.models.unet import Unet

K = int(sys.argv[1]) if len(sys.argv) > 1 else 100
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
label = sys.argv[3] if len(sys.argv) > 3 else "base"
style = sys.argv[4] if len(sys.argv) > 4 else "gsg"
H, SR = 128, 2
HR = H * SR

on_tpu = jax.devices()[0].platform in ("tpu", "axon")
dtype = jnp.bfloat16 if on_tpu else jnp.float32

# the LCG chunk sweep is plumbed through the library ARGUMENT (the library
# itself reads no env vars — ADVICE r2); this harness still accepts the env
# var as its own launch convention
LCG_CLASS_CHUNK = int(os.environ.get("WCTPU_LCG_CLASS_CHUNK", "4"))

unet = Unet(config=UnetModelConfig(), fused=on_tpu, dtype=dtype)
sched = linear_schedule(1000)
uparams = jax.jit(unet.init)(
    jax.random.PRNGKey(0), jnp.zeros((1, H, H, 3)), jnp.zeros((1,), jnp.int32)
)["params"]
seg = make_seg_model("deeplabv3plus_resnet101", num_classes=19, train=False, dtype=dtype)
seg_vars = jax.jit(seg.init)(jax.random.PRNGKey(3), jnp.zeros((1, HR, HR, 3)))
gen = Generator(upscale_factor=SR, dtype=dtype)
gvars = jax.jit(gen.init)(jax.random.PRNGKey(4), jnp.zeros((1, H, H, 3)))
gt = jax.random.randint(jax.random.PRNGKey(7), (B, HR, HR), 0, 19)


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
        start_t=K - 1, guidance_style=style, lcg_class_chunk=LCG_CLASS_CHUNK,
    )


copts = None
vmem_kib = os.environ.get("WCTPU_SCOPED_VMEM_KIB")
if vmem_kib:
    copts = {"xla_tpu_scoped_vmem_limit_kib": vmem_kib}
# arbitrary compiler-option sweep: WCTPU_XLA_COPTS="flag=val,flag=val"
# (fresh process per variant — CLAUDE.md rule 3)
extra = os.environ.get("WCTPU_XLA_COPTS")
if extra:
    copts = dict(copts or {})
    for kv in extra.split(","):
        k, v = kv.split("=", 1)
        copts[k.strip()] = v.strip()
f = jax.jit(run, compiler_options=copts)
allp = (uparams, seg_vars, gvars)
float(jnp.sum(f(allp, jax.random.PRNGKey(999)).astype(jnp.float32)))  # compile
best = 1e9
for r in range(4):
    kk = jax.random.PRNGKey(1000 + r)
    float(jnp.sum(kk))
    t0 = time.perf_counter()
    float(jnp.sum(f(allp, kk).astype(jnp.float32)))
    best = min(best, time.perf_counter() - t0)
ms = best / K * 1000.0
per_min = B * 60.0 / (ms / 1000.0 * 1000)
print(f"{label:28s} {ms:8.3f} ms/step   ({per_min:6.2f} tr/min @1000)", flush=True)
