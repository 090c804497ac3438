"""HBM envelope of the flagship guided-translate program (VERDICT r2 item 8).

Runs ONE short guided-translate scan per configuration on the real chip and
records the backend's live/peak HBM counters (core/profiling
.device_memory_stats), turning the "1024px+ guidance needs spatial sharding"
claim (parallel/spatial.py) quantitative: the table shows how peak HBM grows
with the guidance resolution (sr factor) and batch.

Peak HBM for a jitted program is set by the compiled buffer plan, not by the
number of steps, so K=8 steps measure the same envelope as 1000 — each row
stays cheap. Rows: the headline (sr=2/256px, B=8), the reference shape
(sr=4/512px, B=8 and the reference's own B=1), and sr=8/1024px B=1 (the
spatial-sharding motivation) — the last is attempted and recorded as OOM if
the backend refuses.

`peak_bytes_in_use` is a process-lifetime high-water mark with no reset in
PJRT, so each configuration runs in its OWN subprocess (the parent re-execs
itself with --config <label>); peaks never compound across rows.

Usage: python scripts/hbm_envelope.py [K=8]
Writes outputs/hbm_envelope.json (merge into PROFILE.md).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

cache_dir = os.path.expanduser("~/.cache/jax_compcache")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from weatherconverter_tpu.core.config import UnetModelConfig
from weatherconverter_tpu.core.profiling import device_memory_stats
from weatherconverter_tpu.diffusion.schedule import linear_schedule
from weatherconverter_tpu.guidance.translate import sample_with_sgg
from weatherconverter_tpu.models.factory import make_seg_model
from weatherconverter_tpu.models.srgan import Generator
from weatherconverter_tpu.models.unet import Unet

# (label, latent_px, sr, batch). The SRGAN family has no true 8x (the
# reference's own upscale_factor//2 formula — srgan_model/models.py:83 —
# gives 2x/4x/16x), so the 1024px-guidance row scales the LATENT to 256px
# and keeps the reference's real 4x SR.
CONFIGS = [("headline_256px", 128, 2, 8), ("reference_512px", 128, 4, 8),
           ("reference_512px_b1", 128, 4, 1), ("hires_1024px_b1", 256, 4, 1)]

argv = [a for a in sys.argv[1:] if not a.startswith("--config")]
K = int(argv[0]) if argv else 8

if "--config" not in " ".join(sys.argv):
    # parent: one subprocess per config so each row gets a fresh peak counter
    import subprocess

    rows = []
    for label, _, _, _ in CONFIGS:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(K),
             f"--config={label}"],
            capture_output=True, text=True, timeout=3600,
        )
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        if line:
            rows.append(json.loads(line[-1]))
        else:
            rows.append({"label": label, "status": "subprocess-failed",
                         "detail": (r.stderr or "")[-300:]})
        print(json.dumps(rows[-1]), flush=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(repo, "outputs"), exist_ok=True)
    with open(os.path.join(repo, "outputs", "hbm_envelope.json"), "w") as f:
        json.dump({"rows": rows}, f, indent=2)
    print("wrote outputs/hbm_envelope.json")
    sys.exit(0)

ONLY = [a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--config=")][0]

on_tpu = jax.devices()[0].platform in ("tpu", "axon")
dtype = jnp.bfloat16 if on_tpu else jnp.float32

unet = Unet(config=UnetModelConfig(), fused=on_tpu, dtype=dtype)
sched = linear_schedule(1000)
uparams = jax.jit(unet.init)(
    jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), jnp.zeros((1,), jnp.int32)
)["params"]

rows = []
for label, H, SR, B in CONFIGS:
    if label != ONLY:
        continue
    HR = H * SR
    row = {"label": label, "latent_px": H, "sr": SR, "batch": B,
           "hr_px": HR, "steps": K}
    try:
        seg = make_seg_model("deeplabv3plus_resnet101", num_classes=19,
                             train=False, dtype=dtype)
        seg_vars = jax.jit(seg.init)(
            jax.random.PRNGKey(3), jnp.zeros((1, HR, HR, 3))
        )
        gen = Generator(upscale_factor=SR, dtype=dtype)
        gvars = jax.jit(gen.init)(jax.random.PRNGKey(4),
                                  jnp.zeros((1, H, H, 3)))
        gt = jax.random.randint(jax.random.PRNGKey(7), (B, HR, HR), 0, 19)

        def run(up, sv, gv, g, k):
            k1, k2 = jax.random.split(k)
            inp = jax.random.normal(k1, (B, H, H, 3)) * 0.2
            return sample_with_sgg(
                lambda xt, tt: unet.apply({"params": up}, xt, tt), sched,
                lambda im: seg.apply(sv, im), lambda im: gen.apply(gv, im),
                inp, g, k2, lam=60.0, num_steps=K, num_classes=19,
                mode="fixed", start_t=K - 1, guidance_style="gsg",
            )

        # Compile first and record XLA's buffer plan: the tunneled axon
        # backend returns all-zero live memory_stats(), so the compile-time
        # memory analysis (argument/output/temp bytes of the compiled
        # program) IS the envelope of record; live counters are kept only
        # when the backend actually reports them.
        compiled = jax.jit(run).lower(
            uparams, seg_vars, gvars, gt, jax.random.PRNGKey(9)
        ).compile()
        try:
            ma = compiled.memory_analysis()
            arg_b = int(getattr(ma, "argument_size_in_bytes", 0))
            out_b = int(getattr(ma, "output_size_in_bytes", 0))
            tmp_b = int(getattr(ma, "temp_size_in_bytes", 0))
            alias_b = int(getattr(ma, "alias_size_in_bytes", 0))
            row.update(
                plan_args_gib=round(arg_b / 2**30, 3),
                plan_output_gib=round(out_b / 2**30, 3),
                plan_temp_gib=round(tmp_b / 2**30, 3),
                plan_total_gib=round((arg_b + out_b + tmp_b - alias_b) / 2**30, 3),
            )
        except Exception as e:  # noqa: BLE001 — analysis support varies
            row.update(plan_detail=f"memory_analysis unavailable: {e}"[-200:])
        out = compiled(uparams, seg_vars, gvars, gt, jax.random.PRNGKey(9))
        float(jnp.sum(out.astype(jnp.float32)))  # force (scalar readback)
        stats = device_memory_stats()
        if stats.get("peak_bytes_in_use", 0):
            row.update(
                peak_hbm_gib=round(stats.get("peak_bytes_in_use", 0) / 2**30, 3),
                live_hbm_gib=round(stats.get("bytes_in_use", 0) / 2**30, 3),
                hbm_limit_gib=round(stats.get("bytes_limit", 0) / 2**30, 3),
            )
        row.update(status="ok")
    except Exception as e:  # noqa: BLE001 — OOM rows are a RESULT here
        msg = f"{type(e).__name__}: {e}"
        row.update(status="oom" if "RESOURCE_EXHAUSTED" in msg
                   or "Out of memory" in msg else "error",
                   detail=msg[-300:])
    row["device"] = str(jax.devices()[0])
    print(json.dumps(row), flush=True)
