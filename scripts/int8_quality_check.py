"""Validate the int8-QK^T inference attention path on the REAL pipeline.

Runs the full 1000-step guided translate twice with identical params, label
map and rng key — exact bf16 flash attention vs the int8-QK^T kernel — and
reports how far the final 256px outputs diverge: per-pixel stats, Pearson
correlation, and seg-prediction agreement (the quality statistic the
north-star cares about: would the translated image segment differently?).

The int8 path is inference-only (bench.py/CLI translate+sample); training
always uses the exact kernel. This script is the in-situ quality gate for
that default (PROFILE.md round 4).

Usage: python scripts/int8_quality_check.py [K=1000] [B=8]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

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

K = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
H, SR = 128, 2
HR = H * SR

on_tpu = jax.devices()[0].platform in ("tpu", "axon")
dtype = jnp.bfloat16 if on_tpu else jnp.float32

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


def run(params, key, salt):
    # `salt` differs per variant and multiplies by zero: identical math, but
    # a DIFFERENT args fingerprint. The tunneled backend result-caches on
    # args ALONE (measured 2026-08-17: two different programs fed identical
    # args return bit-identical results) — without the salt this comparison
    # silently compares a cached result with itself.
    up_, sv_, gv_ = params
    k1, k2 = jax.random.split(key)
    inp = jax.random.normal(k1, (B, H, H, 3)) * 0.2
    # runtime predicate (always true) — unfoldable, so `salt` survives into
    # the argument list and the two variants get distinct cache keys
    inp = jnp.where(salt > -1.0, inp, jnp.zeros_like(inp))
    return sample_with_sgg(
        lambda xt, tt: unet.apply({"params": up_}, xt, tt),
        sched,
        lambda im: seg.apply(sv_, im),
        lambda im: gen.apply(gv_, im),
        inp, gt, k2,
        lam=60.0, num_steps=K, num_classes=19, mode="fixed",
        start_t=K - 1, guidance_style="gsg",
    )


def seg_pred(sv_, img):
    return jnp.argmax(seg.apply(sv_, img.astype(dtype)), axis=-1)


allp = (uparams, seg_vars, gvars)
key = jax.random.PRNGKey(42)

outs = {}
for salt, (name, flag) in enumerate((("bf16", "0"), ("int8", "1"))):
    os.environ["WCTPU_ATTN_QK_INT8"] = flag
    f = jax.jit(run)  # retrace: the flag is read at trace time
    out = np.asarray(f(allp, key, jnp.float32(salt)).astype(jnp.float32))
    pred = np.asarray(jax.jit(seg_pred)(seg_vars, jnp.asarray(out)))
    outs[name] = (out, pred)
    print(f"{name}: out mean {out.mean():+.5f} std {out.std():.5f}")

a, pa = outs["bf16"]
b, pb = outs["int8"]
diff = np.abs(a - b)
corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
agree = float((pa == pb).mean())
print(f"max|diff| {diff.max():.5f}  mean|diff| {diff.mean():.6f}  "
      f"rel-to-std {diff.max() / a.std():.4f}")
print(f"pearson corr {corr:.6f}")
print(f"seg argmax agreement {agree:.5f}")
ok = corr > 0.99 and agree > 0.97
print("INT8 QUALITY OK" if ok else "INT8 QUALITY FAIL")
sys.exit(0 if ok else 1)
