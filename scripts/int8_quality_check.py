"""Validate the int8-QK^T inference attention path on the REAL pipeline.

Runs the full 1000-step guided translate twice with identical params, label
map and rng key — exact bf16 flash attention vs the int8-QK^T kernel — and
reports how far the final 256px outputs diverge: per-pixel stats, Pearson
correlation, and seg-prediction agreement (the quality statistic the
north-star cares about: would the translated image segment differently?).

The int8 path is inference-only (bench.py/CLI translate+sample); training
always uses the exact kernel. This script is the in-situ quality gate for
that default (PROFILE.md round 4).

The chaos FLOOR is a distribution, not a point (VERDICT r2 item 3): the
int8 trajectory is compared against N innocuous same-scale perturbation
runs (default 5), and must sit within 2 sigma of that floor's mean on both
statistics. Writes outputs/int8_quality_r05.json.

Usage: python scripts/int8_quality_check.py [K=1000] [B=8] [N_FLOOR=5]
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
N_FLOOR = int(sys.argv[3]) if len(sys.argv) > 3 else 5
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


import functools


@functools.partial(jax.jit, static_argnames=("variant", "perturb"))
def run(params, key, salt, variant, perturb=False, pert_seed=1):
    # `variant` is STATIC so each flag setting gets its own trace — jax's
    # in-process jit cache keys on (function, avals, statics), NOT on env
    # vars read at trace time; without it the second variant silently
    # re-executes the first variant's compiled program (that artifact
    # produced an exact-0 diff here and was previously misdiagnosed as a
    # backend result cache keyed on args alone). `salt` additionally gives
    # each variant a distinct args fingerprint via an unfoldable runtime
    # predicate, guarding against any backend-side result caching.
    del variant
    up_, sv_, gv_ = params
    k1, k2 = jax.random.split(key)
    inp = jax.random.normal(k1, (B, H, H, 3)) * 0.2
    if perturb:
        # chaos-floor control: an innocuous input perturbation at the int8
        # quantization-noise scale — how far the ITERATED chain diverges
        # from ANY same-scale disturbance, the fair yardstick for the int8
        # trajectory divergence (a 1000-step guided chain is chaotic).
        inp = inp + 1e-3 * jax.random.normal(
            jax.random.fold_in(k1, pert_seed), inp.shape
        )
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

runs = [("bf16", "0", False, 0), ("int8", "1", False, 0)]
runs += [(f"bf16-pert{s}", "0", True, s) for s in range(1, N_FLOOR + 1)]

outs = {}
for salt, (name, flag, pert, ps) in enumerate(runs):
    os.environ["WCTPU_ATTN_QK_INT8"] = flag
    # floor runs share ONE static variant ("bf16-pert"): the env flag is
    # identical across them, so one trace is correct — pert_seed is a
    # runtime arg and must not trigger 5 recompiles of a 1000-step program
    variant = "bf16-pert" if pert else name
    out = np.asarray(
        run(allp, key, jnp.float32(salt), variant=variant, perturb=pert,
            pert_seed=ps)
        .astype(jnp.float32)
    )
    pred = np.asarray(jax.jit(seg_pred)(seg_vars, jnp.asarray(out)))
    outs[name] = (out, pred)
    print(f"{name}: out mean {out.mean():+.5f} std {out.std():.5f}")

a, pa = outs["bf16"]


def against_bf16(name):
    b, pb = outs[name]
    diff = np.abs(a - b)
    corr = float(np.corrcoef(a.ravel(), b.ravel())[0, 1])
    agree = float((pa == pb).mean())
    print(f"{name} vs bf16:  max|diff| {diff.max():.5f}  "
          f"mean|diff| {diff.mean():.6f}  pearson {corr:.6f}  "
          f"seg-agree {agree:.5f}")
    return corr, agree


corr_i8, agree_i8 = against_bf16("int8")
floor = [against_bf16(f"bf16-pert{s}") for s in range(1, N_FLOOR + 1)]
floor_corr = np.asarray([c for c, _ in floor])
floor_agree = np.asarray([g for _, g in floor])
cm, cs = float(floor_corr.mean()), float(floor_corr.std(ddof=1))
gm, gs = float(floor_agree.mean()), float(floor_agree.std(ddof=1))
print(f"chaos floor over {N_FLOOR} perturbation seeds: "
      f"corr {cm:.6f}±{cs:.6f}  seg-agree {gm:.5f}±{gs:.5f}")

# PASS iff (1) the quality statistic of record holds (translated images
# segment the same) and (2) the int8 trajectory diverges no further than the
# chaos-floor DISTRIBUTION — within 2 sigma of what same-scale innocuous
# perturbations do to this 1000-step chain (VERDICT r2 item 3: the old
# one-seed floor left a 1e-4 margin with no error bar). Absolute pixel
# correlation is NOT the criterion: the iterated chain is chaotic, so any
# epsilon-scale change decorrelates pixels without changing the output
# distribution (means/stds match to 1e-4).
ok = (agree_i8 > 0.97
      and corr_i8 >= cm - 2.0 * cs
      and agree_i8 >= gm - 2.0 * gs)

import json

artifact = {
    "steps": K, "batch": B, "n_floor_seeds": N_FLOOR,
    "int8": {"pearson": corr_i8, "seg_agree": agree_i8},
    "chaos_floor": {
        "pearson": {"mean": cm, "std": cs, "values": floor_corr.tolist()},
        "seg_agree": {"mean": gm, "std": gs, "values": floor_agree.tolist()},
    },
    "criteria": {
        "seg_agree_abs_min": 0.97,
        "within_2sigma_of_floor": bool(corr_i8 >= cm - 2.0 * cs
                                       and agree_i8 >= gm - 2.0 * gs),
    },
    "pass": bool(ok),
}
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.makedirs(os.path.join(repo, "outputs"), exist_ok=True)
with open(os.path.join(repo, "outputs", "int8_quality_r05.json"), "w") as fj:
    json.dump(artifact, fj, indent=2)
print("wrote outputs/int8_quality_r05.json")
print("INT8 QUALITY OK" if ok else "INT8 QUALITY FAIL")
sys.exit(0 if ok else 1)
