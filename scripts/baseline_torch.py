"""Measure the PyTorch reference baseline (BASELINE.md's own procedure).

Runs the five BASELINE.json configs against the actual reference modules
under /root/reference (random-init weights — the reference's shipped
checkpoints are not in the repo; random init changes FLOPs not at all) on
this machine's CPU, and records:

  - per-UNet-step ms (128px, the production unet_base.Unet)
  - per-guided-step ms for BOTH schedules (GSG-every-step, the headline
    workload; and the reference's real alternating even->LCG / odd->GSG
    schedule, translation.py:84-87), per-step body exactly as
    translation.py:74-90 executes it (scheduler step, SRGAN upscale,
    seg fwd + input-grad via seg_model.inference.infer)
  - unconditional sampling steps (sample_ddpm.py:35-44 body)
  - DDPM train-step img/s (train_ddpm.py:98-114 step: eps-MSE fwd+bwd+Adam)
  - seg inference img/s at 512px (seg_model/inference.py:118-143, no_grad)

Two shape variants for the guided step:
  - `bench` — SRGAN 2x (128->256), seg at 256px: the shape bench.py times
    the TPU build at (apples-to-apples with BENCH_r*.json)
  - `reference` — SRGAN 4x (128->512), seg at 512px: the pipeline as the
    reference actually ships it (translation.py:113 loads a 4x generator)

Honesty caveats (recorded in the JSON): this is CPU torch (the reference
targets a single CUDA GPU the harness does not have); torch uses all host
cores; numbers are min-over-repeats of K-step averages.

Usage: python scripts/baseline_torch.py [--quick]
Writes outputs/baseline_torch.json and prints the table rows.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, REF)

import numpy as np  # noqa: E402
import torch  # noqa: E402

# torchvision is not in this image. The reference imports it at module level
# (seg_model/inference.py:7, srgan_model/inference.py:3, ext_transforms) but
# none of the functions this script times ever CALL it — shim the modules so
# the measured code paths are byte-for-byte the reference's.
import types  # noqa: E402

if "torchvision" not in sys.modules:
    try:
        import torchvision  # noqa: F401
    except ImportError:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tvf = types.ModuleType("torchvision.transforms.functional")
        tvu = types.ModuleType("torchvision.utils")
        tvt.functional = tvf
        tvt.ToPILImage = lambda *a, **k: (lambda x: x)
        tvt.Compose = lambda *a, **k: (lambda x: x)
        tvt.ToTensor = lambda *a, **k: (lambda x: x)
        tvt.Normalize = lambda *a, **k: (lambda x: x)
        tvt.CenterCrop = lambda *a, **k: (lambda x: x)
        tvt.Resize = lambda *a, **k: (lambda x: x)
        tvf.normalize = lambda x, *a, **k: x
        tvf.resize = lambda x, *a, **k: x
        tvf.hflip = lambda x: x
        tvf.vflip = lambda x: x
        tvf.crop = lambda x, *a, **k: x
        tvf.pad = lambda x, *a, **k: x
        tvf.rotate = lambda x, *a, **k: x
        tvf.affine = lambda x, *a, **k: x
        tvf.adjust_brightness = lambda x, *a, **k: x
        tvf.adjust_contrast = lambda x, *a, **k: x
        tvf.adjust_saturation = lambda x, *a, **k: x
        tvf.adjust_hue = lambda x, *a, **k: x
        tvf.to_tensor = lambda x: x
        tvf.center_crop = lambda x, *a, **k: x
        tvu.make_grid = lambda x, **k: x
        tv.transforms = tvt
        tv.utils = tvu
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
        sys.modules["torchvision.transforms.functional"] = tvf
        sys.modules["torchvision.utils"] = tvu

# seg_model/utils/__init__.py:2 imports `.visualizer`, a module the reference
# repo never committed (presumably a visdom helper) — the upstream package is
# unimportable as shipped. Shim it; nothing this script times touches it.
_vis = types.ModuleType("seg_model.utils.visualizer")


class _Visualizer:  # noqa: D401 - placeholder
    def __init__(self, *a, **k):
        pass


_vis.Visualizer = _Visualizer
sys.modules.setdefault("seg_model.utils.visualizer", _vis)


# unet_base.py:461 hardcodes `.cuda()` inside forward; on this CUDA-less
# host make it a no-op (identity — does not change what is measured).
if not torch.cuda.is_available():
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self


def timeit(fn, steps, repeats=3, warmup=1):
    """min-over-repeats of the per-step average (same policy as bench.py)."""
    for _ in range(warmup):
        fn()
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(steps):
            fn()
        best = min(best, (time.perf_counter() - t0) / steps)
    return best * 1000.0  # ms


def build_models(sr_factor: int):
    import yaml
    from diffusion_model.config.models import Config
    from diffusion_model.models.unet_base import Unet
    from diffusion_model.scheduler.linear_noise_scheduler import (
        LinearNoiseScheduler,
    )
    from seg_model.network.modeling import deeplabv3plus_resnet101
    from srgan_model.models import Generator

    with open(os.path.join(REF, "diffusion_model/config/config.yaml")) as f:
        cfg = Config(**yaml.safe_load(f))
    torch.manual_seed(0)
    unet = Unet(cfg.model).eval()
    sched = LinearNoiseScheduler(
        num_timesteps=cfg.diffusion.num_timesteps,
        beta_start=cfg.diffusion.beta_start,
        beta_end=cfg.diffusion.beta_end,
    )
    seg = deeplabv3plus_resnet101(
        num_classes=19, output_stride=16, pretrained_backbone=False
    ).eval()
    srgan = Generator(upscale_factor=sr_factor).eval()
    return cfg, unet, sched, seg, srgan


def lcg_cost(seg, mu, sigma, sr_xt, gt):
    """The 19 class-masked seg fwd+bwds + numpy pooling of the reference's
    apply_lcg (sgg.py:27-57) WITHOUT its final recombination — which cannot
    execute: sgg.py:58 multiplies the [19,1,3,128,128] latent stack by the
    [19,1,1,512,512] mask stack and raises RuntimeError (the shape bug our
    jax port documents in guidance/sgg.py:29-31). This harness times the
    work the reference WOULD do per even step; the recombination it crashes
    on is O(latent) and would add negligibly."""
    import torch.nn.functional as tF
    from seg_model.inference import compute_gradient_magnitude, infer

    for c in range(19):
        mc = (gt == c).long().unsqueeze(1)
        xt_masked = sr_xt * mc
        gt_masked = gt * mc.squeeze(0)
        _, input_gradients, _ = infer(seg, xt_masked, gt_masked)
        g = tF.avg_pool2d(input_gradients, kernel_size=4, stride=4)
        compute_gradient_magnitude(g, denormalize=True, norm=False)


def guided_step_fn(unet, sched, seg, srgan, B, lr_size, style):
    """One reverse step exactly as translation.py:74-90: UNet fwd,
    sample_prev_timestep, SRGAN upscale, apply_gsg or apply_lcg (which run
    seg fwd + loss.backward to the input via seg_model.inference.infer).
    LCG even steps use lcg_cost (see above: the reference's own apply_lcg
    recombination raises at production shapes)."""
    import srgan_model.inference as srgan_infer
    from sgg.sgg import apply_gsg

    with torch.no_grad():
        hr = srgan(torch.zeros(1, 3, lr_size, lr_size)).shape[-1]
    xt = torch.randn(B, 3, lr_size, lr_size)
    gt = torch.randint(0, 19, (B, hr, hr))
    state = {"i": 499}

    def step():
        i = state["i"]
        with torch.no_grad():
            noise_pred = unet(xt, torch.as_tensor(i).unsqueeze(0))
            mu, sigma, _ = sched.sample_prev_timestep(
                xt, noise_pred, torch.as_tensor(i)
            )
            sr_xt = srgan_infer.inference(srgan, xt)
        if style == "gsg" or (style == "alternate" and i % 2 == 1):
            apply_gsg(seg, mu, sigma, sr_xt, gt, 60.0)
        elif style == "alternate" and i % 2 == 0 and i != 0:
            lcg_cost(seg, mu, sigma, sr_xt, gt)
        state["i"] = (i - 1) if i > 1 else 499

    return step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="fewer timed steps")
    ap.add_argument("--batch", type=int, default=8, help="bench.py's B")
    args = ap.parse_args()
    B = args.batch
    K = 2 if args.quick else 5
    rep = 1 if args.quick else 2

    # silence the reference's per-call prints (sgg's compute_gradient_magnitude
    # prints min/max every step)
    import builtins

    _print = builtins.print

    def run_quiet(fn, *a, **kw):
        builtins.print = lambda *x, **y: None
        try:
            return fn(*a, **kw)
        finally:
            builtins.print = _print

    out = {
        "hardware": f"CPU ({os.cpu_count()} cores, torch {torch.__version__}, "
                    f"{torch.get_num_threads()} threads)",
        "weights": "random-init (reference ships no checkpoints in-repo)",
        "batch": B,
        "caveat": "reference targets a single CUDA GPU; none available here. "
                  "CPU-torch numbers bound the comparison from below — the "
                  "TPU-vs-GPU comparison is inferable only via per-step FLOP "
                  "parity (identical per-step math, see PROFILE.md).",
    }

    # ---- 1. per-UNet-step (128px production ladder) ----
    cfg, unet, sched, seg, srgan4 = build_models(sr_factor=4)
    xt = torch.randn(B, 3, 128, 128)

    def unet_step():
        with torch.no_grad():
            unet(xt, torch.as_tensor(400).unsqueeze(0))

    out["unet_fwd_ms_b8_128px"] = round(timeit(unet_step, K, rep), 2)
    _print(f"unet fwd (B={B}, 128px): {out['unet_fwd_ms_b8_128px']} ms")

    # ---- 2. unconditional sampling step (sample_ddpm.py:35-44) ----
    state = {"xt": torch.randn(B, 3, 128, 128), "i": 999}

    def sample_step():
        i = state["i"]
        with torch.no_grad():
            noise_pred = unet(state["xt"], torch.as_tensor(i).unsqueeze(0))
            mean, sigma, _ = sched.sample_prev_timestep(
                state["xt"], noise_pred, torch.as_tensor(i)
            )
            state["xt"] = mean + sigma if i != 0 else mean
        state["i"] = (i - 1) if i > 0 else 999

    ms = timeit(sample_step, K, rep)
    out["sample_step_ms_b8"] = round(ms, 2)
    out["samples_per_min_1000steps_b8"] = round(B * 60000.0 / (ms * 1000), 3)
    _print(f"sample step: {out['sample_step_ms_b8']} ms -> "
           f"{out['samples_per_min_1000steps_b8']} samples/min at 1000 steps")

    # ---- 3. guided step, reference-faithful shape (SRGAN 4x -> seg 512px,
    #         B=1 exactly as translation.py runs it) ----
    # B=1 because the reference CANNOT batch translation — sgg.py's
    # compute_gradient_magnitude squeezes/denormalizes assuming batch 1
    # (inference.py:123 "The batch dimension should be 1 !!!"), so a stream
    # of images runs sequentially; throughput = 60000 / (step_ms * steps).
    # The bench.py 256px/2x shape is NOT measurable with reference code at
    # all: sgg.py:18 hardcodes the 4x avg_pool (512->128); a 2x SRGAN breaks
    # its shapes. Shape-matched comparison instead uses bench.py --sr 4.
    out["batching"] = "reference guided path is B=1-only (inference.py:123)"
    out["lcg_note"] = (
        "the reference's apply_lcg CRASHES at its own production shapes "
        "(sgg.py:58 multiplies 128px latents by 512px masks -> RuntimeError); "
        "even-step cost measured via the 19 masked seg fwd+bwds it performs "
        "before the crashing recombination (see lcg_cost docstring)"
    )
    for style in ("gsg", "alternate"):
        step = guided_step_fn(unet, sched, seg, srgan4, 1, 128, style)
        ms = run_quiet(timeit, step, K if style == "gsg" else 2 * K, rep)
        out[f"guided_step_ms_ref512_b1_{style}"] = round(ms, 2)
        tr = 1 * 60000.0 / (ms * 500)  # reference N=500 (translation.py:56)
        out[f"translations_per_min_500steps_ref512_b1_{style}"] = round(tr, 3)
        _print(f"guided step [ref512/B=1/{style}]: {ms:.1f} ms -> "
               f"{tr:.3f} tr/min at the reference's 500 steps")

    # ---- 5. DDPM train step (train_ddpm.py:98-114: eps-MSE + Adam) ----
    opt = torch.optim.Adam(unet.parameters(), lr=1e-4)
    crit = torch.nn.MSELoss()
    unet.train()
    imgs = torch.randn(B, 3, 128, 128)

    def train_step():
        opt.zero_grad()
        noise = torch.randn_like(imgs)
        t = torch.randint(0, 1000, (B,))
        noisy = sched.add_noise(imgs, noise, t)
        loss = crit(unet(noisy, t), noise)
        loss.backward()
        opt.step()

    ms = timeit(train_step, K, rep)
    unet.eval()
    out["train_step_ms_b8"] = round(ms, 2)
    out["train_img_per_s"] = round(B * 1000.0 / ms, 2)
    _print(f"train step: {ms:.1f} ms -> {out['train_img_per_s']} img/s")

    # ---- 6. seg inference 512px (inference.py:118-143, no_grad fwd) ----
    x512 = torch.randn(B, 3, 512, 512)

    def seg_infer_step():
        with torch.no_grad():
            seg(x512)

    ms = timeit(seg_infer_step, K, rep)
    out["seg_infer_ms_b8_512px"] = round(ms, 2)
    out["seg_infer_img_per_s"] = round(B * 1000.0 / ms, 2)
    _print(f"seg infer 512px: {ms:.1f} ms -> {out['seg_infer_img_per_s']} img/s")

    os.makedirs(os.path.join(REPO, "outputs"), exist_ok=True)
    path = os.path.join(REPO, "outputs", "baseline_torch.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    _print(f"wrote {path}")
    _print(json.dumps(out))


if __name__ == "__main__":
    main()
