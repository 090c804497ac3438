"""Headline MFU (model-FLOPs-utilization) for the flagship programs.

Method (stated per VERDICT r3 item 4):
  * FLOPs come from XLA's HLO cost analysis of the EXACT per-step component
    programs at production shapes (`jax.jit(f).lower(*abstract args*)
    .cost_analysis()['flops']` — the same counter that returned exactly
    2*M*N*K for a plain matmul when probed). This is the pre-optimization
    count of the lowered StableHLO: algorithmic FLOPs of the program as
    written, before XLA fusion/DCE — the standard "model FLOPs" numerator
    (fusion changes bytes, not useful FLOPs; nothing in these step bodies is
    dead code).
  * Params/inputs are abstract (jax.eval_shape / ShapeDtypeStruct): no
    weights are materialized and nothing executes — counting is exact and
    takes seconds.
  * Scan-based chains are counted per STEP by lowering the step-body
    composition directly (HLO cost analysis does not multiply a while-loop
    body by its trip count, so diffing scan lengths would not work).
  * MFU = step_flops / (measured_step_seconds * PEAK). Peak for one TPU v5e
    chip is 197 TFLOP/s bf16 (public v5e spec). Measured step times default
    to the official bench numbers recorded in PROFILE.md (round 5, real
    chip, 1000 steps, B=8) and can be overridden with --times.

Per-step FLOP composition (mirrors bench.py's programs; reference workload =
translation.py:74-90):
  exact      = unet + srgan + gsg_sr + posterior
  headline   = unet + posterior + gsg_latent/2          (gevery2 + latent)
  alternate  = unet + srgan + posterior + (lcg19 + gsg_sr)/2
  train      = the whole augmented ddpm train step (one optimizer step)

Usage:  python scripts/mfu.py [--json outputs/mfu_r06.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ["JAX_PLATFORMS"] = "cpu"

V5E_PEAK_BF16 = 197e12  # FLOP/s, one v5e chip

# official measured per-step seconds (PROFILE.md round 5: tr/min/chip at
# B=8, 1000 steps -> s/step = 8*60 / (tr_per_min * 1000); train: img/s)
OFFICIAL = {
    "translate_headline": 8 * 60 / (32.841 * 1000),
    "translate_exact": 8 * 60 / (19.410 * 1000),
    "translate_alternate": 8 * 60 / (6.275 * 1000),
    "train": 8 / 134.7,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None, help="also write a JSON artifact")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument(
        "--times", nargs="*", default=[],
        help="override measured step seconds as name=seconds "
             f"(names: {', '.join(OFFICIAL)})",
    )
    args = ap.parse_args()
    times = dict(OFFICIAL)
    for kv in args.times:
        k, v = kv.split("=")
        times[k] = float(v)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from weatherconverter_tpu.core.config import UnetModelConfig
    from weatherconverter_tpu.diffusion.schedule import (
        _bcast,
        linear_schedule,
        posterior_mean,
        posterior_sigma,
    )
    from weatherconverter_tpu.guidance.sgg import apply_gsg, apply_lcg
    from weatherconverter_tpu.models.factory import make_seg_model
    from weatherconverter_tpu.models.srgan import Generator
    from weatherconverter_tpu.models.unet import Unet

    B, H, SRF = args.batch, 128, 2
    HR = H * SRF
    dt = jnp.bfloat16  # the benched programs run bf16 on TPU

    ucfg = UnetModelConfig()  # production ladder [64,128,256,512,768]
    unet = Unet(config=ucfg, fused=False, dtype=dt)
    seg = make_seg_model("deeplabv3plus_resnet101", num_classes=19,
                         train=False, dtype=dt)
    gen = Generator(upscale_factor=SRF, dtype=dt)
    sched = linear_schedule(1000)

    key = jax.random.PRNGKey(0)
    x_lat = jax.ShapeDtypeStruct((B, H, H, 3), jnp.float32)
    t_vec = jax.ShapeDtypeStruct((B,), jnp.int32)
    x_hr = jax.ShapeDtypeStruct((B, HR, HR, 3), jnp.float32)
    gt_hr = jax.ShapeDtypeStruct((B, HR, HR), jnp.int32)
    gt_lat = jax.ShapeDtypeStruct((B, H, H), jnp.int32)

    # abstract params: shapes only, nothing materialized
    up = jax.eval_shape(
        lambda k: unet.init(k, jnp.zeros((1, H, H, 3)), jnp.zeros((1,), jnp.int32)),
        key,
    )["params"]
    sv = jax.eval_shape(lambda k: seg.init(k, jnp.zeros((1, HR, HR, 3))), key)
    sv_lat = sv  # same params serve any spatial size (fully convolutional)
    gv = jax.eval_shape(lambda k: gen.init(k, jnp.zeros((1, H, H, 3))), key)

    def flops(f, *a):
        return jax.jit(f).lower(*a).cost_analysis()["flops"]

    def seg_fn_of(v):
        return lambda img: seg.apply(v, img)

    print("counting (abstract lowering, production shapes, B=%d)..." % B)
    F = {}
    F["unet_fwd"] = flops(lambda p, x, t: unet.apply({"params": p}, x, t),
                          up, x_lat, t_vec)
    F["srgan_fwd"] = flops(lambda p, x: gen.apply(p, x), gv, x_lat)
    F["posterior"] = flops(
        lambda x, e: posterior_mean(sched, x, e, jnp.int32(500)), x_lat, x_lat
    )

    mu = x_lat
    sig = jax.ShapeDtypeStruct((1, 1, 1, 1), jnp.float32)

    F["gsg_sr"] = flops(
        lambda v, m, s, sx, g: apply_gsg(seg_fn_of(v), m, s, sx, g, lam=60.0),
        sv, mu, sig, x_hr, gt_hr,
    )
    F["gsg_latent"] = flops(
        lambda v, m, s, sx, g: apply_gsg(seg_fn_of(v), m, s, sx, g, lam=15.0),
        sv_lat, mu, sig, x_lat, gt_lat,
    )
    # HLO cost analysis counts a lax.map/while body ONCE (trip count is not
    # in the cost model), so LCG is lowered with class_chunk == n_slots: one
    # chunk containing every masked copy. Algorithmic FLOPs are identical to
    # the shipped chunk=4 schedule (same 19 masked seg fwd+bwds, different
    # sequencing) — verified: chunk=4 lowering reported exactly 1/5 of this.
    F["lcg19"] = flops(
        lambda v, m, s, sx, g: apply_lcg(
            seg_fn_of(v), m, s, sx, g, lam=60.0, num_classes=19, class_chunk=19
        ),
        sv, mu, sig, x_hr, gt_hr,
    )
    ids12 = jax.ShapeDtypeStruct((B, 12), jnp.int32)
    F["lcg_packed12"] = flops(
        lambda v, m, s, sx, g, i: apply_lcg(
            seg_fn_of(v), m, s, sx, g, lam=60.0, num_classes=19,
            class_chunk=12, class_ids=i,
        ),
        sv, mu, sig, x_hr, gt_hr, ids12,
    )

    # train step: the real augmented program (augment + q-sample + eps-MSE
    # + Adam + EMA), single chip
    from weatherconverter_tpu.training.diffusion import create_ddpm_state
    from weatherconverter_tpu.training.loop_diffusion import (
        make_augmented_train_step,
    )

    step_fn = make_augmented_train_step(sched, crop=H, mesh=None, donate=False)
    state = jax.eval_shape(
        lambda k: create_ddpm_state(unet, k, im_size=H, lr=1e-4), key
    )
    raw = jax.ShapeDtypeStruct((B, H, H, 3), jnp.uint8)
    F["train_step"] = jax.jit(step_fn).lower(
        state, raw, jax.ShapeDtypeStruct((2,), jnp.uint32)
    ).cost_analysis()["flops"]

    steps = {
        "translate_exact": F["unet_fwd"] + F["srgan_fwd"] + F["gsg_sr"] + F["posterior"],
        "translate_headline": F["unet_fwd"] + F["posterior"] + F["gsg_latent"] / 2,
        "translate_alternate": F["unet_fwd"] + F["srgan_fwd"] + F["posterior"]
        + (F["lcg19"] + F["gsg_sr"]) / 2,
        "train": F["train_step"],
    }

    out = {
        "method": "XLA HLO cost analysis of the lowered per-step component "
                  "programs (pre-optimization StableHLO, abstract params), "
                  "composed per schedule; peak = 197 TFLOP/s bf16 (v5e)",
        "batch": B,
        "component_gflops": {k: round(v / 1e9, 2) for k, v in F.items()},
        "programs": {},
    }
    print(f"\ncomponent GFLOPs (B={B}):")
    for k, v in F.items():
        print(f"  {k:16s} {v / 1e9:10.2f}")
    print(f"\n{'program':22s} {'GFLOP/step':>11s} {'ms/step':>9s} {'MFU':>7s}")
    for name, fl in steps.items():
        sec = times[name]
        mfu = fl / sec / V5E_PEAK_BF16
        out["programs"][name] = {
            "gflops_per_step": round(fl / 1e9, 2),
            "measured_ms_per_step": round(sec * 1e3, 3),
            "mfu": round(mfu, 4),
        }
        print(f"{name:22s} {fl / 1e9:11.2f} {sec * 1e3:9.2f} {mfu:7.1%}")

    if args.json:
        with open(args.json, "w") as fh:
            json.dump(out, fh, indent=1)
        print(f"\nwrote {args.json}")


if __name__ == "__main__":
    main()
