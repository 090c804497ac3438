"""In-situ A/B harness for the DDPM train step (the bench.py --mode train
program: production 128px UNet, bf16 activations / f32 params, Adam,
donated state, no augmentation — reference workload train_ddpm.py:94-127).

The tap-matmul episode (PROFILE.md round 3) proved microbench deltas do not
transfer on this backend — every candidate train-path optimization gets
timed HERE, on the exact program bench.py ships, before it may land.
Trace-time env-flag variants need a fresh process each (CLAUDE.md rule 3);
batch size changes the avals so it retraces safely within one process, but
the sweep below still launches one process per variant for uniformity.

Usage: [WCTPU_*=...] python scripts/ab_train.py [K] [B] [label]
Prints: one line `label  ms/step  img/s/chip`.

NOTE (round 8): this harness builds its own jit from the raw step pieces,
so its env-free "base" is the PRE-profile program (v1 kernel, bq=128,
16 MiB scoped VMEM). The SHIPPED default (training.diffusion.make_train_step)
now compiles under the raised 32 MiB profile with the v2@bq256 backward —
reproduce it here with WCTPU_ATTN_BWD_V2=1 WCTPU_ATTN_BWD_BQ=256
WCTPU_SCOPED_VMEM_KIB=32768 (the round-8 sweep winner, 54.2-54.3 ms/step).

Attribution modes (WCTPU_AB_MODE): `step` (default — the full donated
train step bench.py times), `fwd` (the jitted loss alone: q-sample + UNet
forward + MSE, no grad), `grad` (value_and_grad, no Adam/EMA update —
isolates the optimizer+donation cost as step−grad and the backward as
grad−fwd). WCTPU_AB_FUSED=0 builds the model with fused=False (XLA
attention instead of the Pallas flash kernels, both directions).
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

cache_dir = os.path.expanduser("~/.cache/jax_compcache")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from weatherconverter_tpu.core.config import UnetModelConfig
from weatherconverter_tpu.diffusion.schedule import linear_schedule
from weatherconverter_tpu.models.unet import Unet
from weatherconverter_tpu.training.diffusion import (
    create_ddpm_state, ddpm_loss_fn, train_step,
)

K = int(sys.argv[1]) if len(sys.argv) > 1 else 50
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
label = sys.argv[3] if len(sys.argv) > 3 else "base"
H = 128
mode = os.environ.get("WCTPU_AB_MODE", "step")

on_tpu = jax.devices()[0].platform in ("tpu", "axon")
dtype = jnp.bfloat16 if on_tpu else jnp.float32

fused = on_tpu and os.environ.get("WCTPU_AB_FUSED", "1") == "1"
unet = Unet(config=UnetModelConfig(), fused=fused, dtype=dtype)
sched = linear_schedule(1000)
# Init on host CPU, then transfer: eager init on the tunneled backend
# remote-compiles ~150 tiny ops (~8 min/process); threefry RNG is
# backend-deterministic so the values are identical either way.
try:
    cpu0 = jax.devices("cpu")[0] if on_tpu else None
except RuntimeError:
    cpu0 = None
if cpu0 is not None:
    # Init param values depend only on shapes/RNG, not on the attention
    # impl, so init the UNFUSED twin (Pallas can't lower on CPU) and swap
    # the fused apply back in.
    init_unet = Unet(config=UnetModelConfig(), fused=False, dtype=dtype)
    with jax.default_device(cpu0):
        state = create_ddpm_state(init_unet, jax.random.PRNGKey(0), im_size=H, lr=1e-4)
    state = jax.device_put(state, jax.devices()[0])
    state = state.replace(apply_fn=unet.apply)
else:
    state = create_ddpm_state(unet, jax.random.PRNGKey(0), im_size=H, lr=1e-4)

# WCTPU_AB_REMAT: wrap the UNet apply in jax.checkpoint to trade recompute
# FLOPs for saved-activation HBM traffic in the backward. `full` saves
# nothing (re-runs the forward inside the bwd); `dots` saves matmul/conv
# outputs only (the usual transformer middle ground).
remat = os.environ.get("WCTPU_AB_REMAT")
if remat:
    pol = {
        "full": None,
        "dots": jax.checkpoint_policies.dots_saveable,
    }[remat]
    wrapped = (
        jax.checkpoint(state.apply_fn, policy=pol)
        if pol is not None
        else jax.checkpoint(state.apply_fn)
    )
    state = state.replace(apply_fn=wrapped)

copts = None
vmem_kib = os.environ.get("WCTPU_SCOPED_VMEM_KIB")
if vmem_kib:
    copts = {"xla_tpu_scoped_vmem_limit_kib": vmem_kib}
extra = os.environ.get("WCTPU_XLA_COPTS")
if extra:
    copts = dict(copts or {})
    for kv in extra.split(","):
        k, v = kv.split("=", 1)
        copts[k.strip()] = v.strip()

if mode == "fwd":
    # forward-only cost of the SAME loss program (q-sample + UNet + MSE)
    fn = jax.jit(
        lambda params, imgs, key: ddpm_loss_fn(params, state.apply_fn, sched, imgs, key),
        compiler_options=copts,
    )
    run = lambda imgs, key: fn(state.params, imgs, key)
elif mode == "grad":
    # backward included, optimizer/EMA update and donation excluded; grads
    # stay device-side (the full step materializes them as temps anyway)
    gfn = jax.jit(
        lambda params, imgs, key: jax.value_and_grad(ddpm_loss_fn)(
            params, state.apply_fn, sched, imgs, key
        ),
        compiler_options=copts,
    )
    run = lambda imgs, key: gfn(state.params, imgs, key)[0]
else:
    step = jax.jit(
        partial(train_step, sched=sched), donate_argnums=(0,),
        compiler_options=copts,
    )
images = jax.random.normal(jax.random.PRNGKey(1), (B, H, H, 3))

if mode == "step":
    state, loss = step(state, images, jax.random.PRNGKey(2))  # compile
else:
    loss = run(images, jax.random.PRNGKey(2))
float(loss)

best = 1e9
for r in range(4):
    kk = jax.random.split(jax.random.PRNGKey(1000 + r), K)
    float(jnp.sum(kk))
    t0 = time.perf_counter()
    if mode == "step":
        for i in range(K):
            state, loss = step(state, images, kk[i])
    else:
        for i in range(K):
            loss = run(images, kk[i])
    float(loss)
    best = min(best, (time.perf_counter() - t0) / K)
ms = best * 1000.0
print(f"{label:32s} {ms:8.3f} ms/step   ({B / best:7.2f} img/s/chip)", flush=True)
