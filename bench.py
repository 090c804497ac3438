"""Headline benchmark: guided 256px translations per minute per chip.

Measures the flagship end-to-end pipeline (weatherconverter_tpu/guidance/
translate.py): per reverse step one production UNet fwd (128px latent,
bf16, fused Pallas kernels on TPU), one Swift-SRGAN 2x upscale (128->256),
and one DeepLabV3+/ResNet-101 CE input-gradient (fwd+bwd at 256px) — the
per-step guided cost of the reference's GSG steps (translation.py:74-87) —
for N reverse steps, all inside one jitted lax.scan.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is value / 20.0 — the BASELINE.json north-star is >=20 guided
256px 1000-step translations/min/chip (the reference publishes no numbers).

Modes: translate (default headline) | sample (unconditional 128px DDPM,
reference sample_ddpm.py shape) | train (DDPM train-step throughput).
--tiny shrinks every model for CPU smoke runs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="translate", choices=["translate", "sample", "train"])
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--tiny", action="store_true", help="tiny models (CPU smoke)")
    p.add_argument("--platform", default=None, help="force jax platform (e.g. cpu)")
    return p.parse_args()


def main():
    args = parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    cache_dir = os.path.expanduser("~/.cache/jax_compcache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from weatherconverter_tpu.core.config import UnetModelConfig
    from weatherconverter_tpu.diffusion.schedule import linear_schedule
    from weatherconverter_tpu.models.unet import Unet

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    if args.tiny:
        ucfg = UnetModelConfig(
            im_size=16, down_channels=[8, 16, 24], mid_channels=[24, 24, 16],
            down_sample=[True, False], time_emb_dim=16, num_down_layers=1,
            num_mid_layers=1, num_up_layers=1, num_heads=2, attn_resolutions=[8],
        )
        steps = min(args.steps, 8)
        seg_name, sr_factor = "deeplabv3plus_resnet18", 2
    else:
        ucfg = UnetModelConfig()  # production 128px ladder
        steps = args.steps
        seg_name, sr_factor = "deeplabv3plus_resnet101", 2

    unet = Unet(config=ucfg, fused=on_tpu, dtype=dtype)
    sched = linear_schedule(1000)
    B = args.batch
    H = ucfg.im_size
    x = jnp.zeros((B, H, H, 3), dtype=jnp.float32)
    t = jnp.zeros((B,), dtype=jnp.int32)
    uparams = jax.jit(unet.init)(jax.random.PRNGKey(0), x[:1], t[:1])["params"]

    if args.mode == "sample":
        from weatherconverter_tpu.diffusion.sampling import ddpm_sample

        # NOTE: params are jit ARGUMENTS everywhere in this file — closed-over
        # arrays become HLO constants and stall this backend's compiler.
        def run(p, key):
            diff_fn = lambda xt, tt: unet.apply({"params": p}, xt, tt)
            return ddpm_sample(diff_fn, sched, key, (B, H, H, 3), num_steps=steps)

        f = jax.jit(run)
        f(uparams, jax.random.PRNGKey(1)).block_until_ready()  # compile
        times = []
        for i in range(args.repeats):
            t0 = time.perf_counter()
            f(uparams, jax.random.PRNGKey(2 + i)).block_until_ready()
            times.append(time.perf_counter() - t0)
        best = min(times)
        value = B * 60.0 / best
        print(json.dumps({
            "metric": f"unconditional_{H}px_{steps}step_samples_per_min_per_chip",
            "value": round(value, 3), "unit": "samples/min/chip",
            "vs_baseline": round(value / 20.0, 3),
        }))
        return

    if args.mode == "train":
        from weatherconverter_tpu.training.diffusion import create_ddpm_state, make_train_step

        state = create_ddpm_state(unet, jax.random.PRNGKey(0), im_size=H, lr=1e-4)
        step = make_train_step(sched, mesh=None, donate=True)
        images = jax.random.normal(jax.random.PRNGKey(1), (B, H, H, 3))
        state, loss = step(state, images, jax.random.PRNGKey(2))  # compile
        jax.block_until_ready(loss)
        n = 20
        t0 = time.perf_counter()
        for i in range(n):
            state, loss = step(state, images, jax.random.PRNGKey(3 + i))
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / n
        value = B / dt
        print(json.dumps({
            "metric": f"ddpm_train_{H}px_images_per_sec_per_chip",
            "value": round(value, 3), "unit": "img/s/chip",
            "vs_baseline": round(value / 20.0, 3),
        }))
        return

    # --- translate (headline) ---
    from weatherconverter_tpu.guidance.translate import sample_with_sgg
    from weatherconverter_tpu.models.factory import make_seg_model
    from weatherconverter_tpu.models.srgan import Generator

    HR = H * sr_factor
    seg = make_seg_model(seg_name, num_classes=19, train=False, dtype=dtype)
    seg_vars = jax.jit(seg.init)(jax.random.PRNGKey(3), jnp.zeros((1, HR, HR, 3)))

    gen = Generator(upscale_factor=sr_factor, dtype=dtype)
    gvars = jax.jit(gen.init)(jax.random.PRNGKey(4), jnp.zeros((1, H, H, 3)))

    inp = jax.random.normal(jax.random.PRNGKey(5), (B, H, H, 3)) * 0.2
    gt = jax.random.randint(jax.random.PRNGKey(6), (B, HR, HR), 0, 19)

    def run(up, sv, gv, i, g, k):
        diff_fn = lambda xt, tt: unet.apply({"params": up}, xt, tt)
        seg_fn = lambda img: seg.apply(sv, img)
        sr_fn = lambda img: gen.apply(gv, img)
        return sample_with_sgg(
            diff_fn, sched, seg_fn, sr_fn, i, g, k,
            lam=60.0, num_steps=steps, num_classes=19, mode="fixed",
            start_t=steps - 1, guidance_style="gsg",
        )

    f = jax.jit(run)
    f(uparams, seg_vars, gvars, inp, gt, jax.random.PRNGKey(7)).block_until_ready()
    times = []
    for i in range(args.repeats):
        t0 = time.perf_counter()
        f(uparams, seg_vars, gvars, inp, gt, jax.random.PRNGKey(8 + i)).block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times)
    value = B * 60.0 / best
    print(json.dumps({
        "metric": f"guided_{HR}px_{steps}step_translations_per_min_per_chip",
        "value": round(value, 3), "unit": "translations/min/chip",
        "vs_baseline": round(value / 20.0, 3),
    }))


if __name__ == "__main__":
    main()
