"""Headline benchmark: guided 256px translations per minute per chip.

Measures the flagship end-to-end pipeline (weatherconverter_tpu/guidance/
translate.py): per reverse step one production UNet fwd (128px latent,
bf16, fused Pallas kernels on TPU), one Swift-SRGAN 2x upscale (128->256),
and one DeepLabV3+/ResNet-101 CE input-gradient (fwd+bwd at 256px) — the
per-step guided cost of the reference's GSG steps (translation.py:74-87) —
for N reverse steps, all inside one jitted lax.scan.

WORKLOAD HONESTY (VERDICT r1 item 2): the headline `translate` mode measures
the GSG schedule. The reference's alternate schedule runs LCG
(19 class-masked seg fwd+bwd) on even steps (translation.py:84-87) — that is
19x the seg work by construction; `--mode translate-alternate` measures it
and is reported alongside, never silently substituted.

HEADLINE SCHEDULE (VERDICT r2 item 1): the north-star is ">=20 guided 256px
1000-step translations/min/chip at FID and mIoU-consistency parity" — parity
of OUTPUT QUALITY, not of schedule. The default headline therefore runs the
fastest guidance variant that PASSED the 2-sigma FID+mIoU parity gate vs the
reference-exact schedule (scripts/headline_parity_gate.py, artifact
outputs/headline_parity_r06.json: 10 seeds, shipped levers all |z| <= 0.59 against a |z| <= 2 criterion): guidance every 2nd step
with lam rescaled x2 (dose-preserving) + seg CE differentiated at latent
resolution (no per-step SRGAN). `--reference-exact` restores the reference's
every-step SR-space schedule; BOTH numbers are reported in PROFILE.md
(32.84 vs 19.41 tr/min on the real chip). The parity-mode default applies to
`translate` only — the alternate/ddim/dpm modes keep exact semantics.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is value / 20.0 — the BASELINE.json north-star is >=20 guided
256px 1000-step translations/min/chip (the reference publishes no numbers).

Modes: translate (default headline) | translate-alternate (even->LCG
schedule) | sample (unconditional 128px DDPM, reference sample_ddpm.py
shape) | train (DDPM train-step throughput). --tiny shrinks every model for
CPU smoke runs.

Timing methodology (v5e via the tunneled backend): params are jit ARGUMENTS
(closed-over arrays become giant HLO constants), every timed call gets a
fresh rng key (the backend caches results of identical (program, args)
pairs), and a scalar readback — not block_until_ready, which does not
reliably block on this backend — stops the clock.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Error signatures that mean "the tunneled backend is down", not "the bench
# code is broken". Only these are converted into a structured outage record
# (exit 0); anything else still exits non-zero so real bugs stay loud.
_OUTAGE_PAT = re.compile(
    r"UNAVAILABLE|DEADLINE_EXCEEDED|backend setup/compile error|"
    r"[Ff]ailed to initialize.*(backend|TPU)|Unable to initialize backend|"
    r"Connection (refused|reset)|Socket closed|RESOURCE_EXHAUSTED.*tunnel",
)


def _emit_outage(args, detail: str) -> None:
    """Record an outage as a parseable JSON line + exit 0 (VERDICT r2 item 2:
    BENCH_r02.json recorded rc=1 + a raw traceback when the tunnel died;
    the driver could not distinguish that from a broken bench)."""
    print(json.dumps({
        "metric": f"{args.mode}_bench",
        "value": None,
        "unit": "translations/min/chip",
        "vs_baseline": None,
        "error": "backend unavailable",
        "detail": detail[-400:],
    }))
    sys.exit(0)


def _probe_backend(args) -> None:
    """Verify the backend initializes BEFORE importing jax in this process.

    Backend-init failures on the tunneled v5e come in two flavors: a raised
    UNAVAILABLE, and a plain HANG (observed: >120 s with no output). Both are
    only safely detectable from a subprocess with a wall-clock bound — jax
    caches a failed backend init for the life of the process. Retries with
    linear backoff ride out short tunnel blips; a persistent outage becomes a
    structured record instead of a traceback.
    """
    last = ""
    for attempt in range(args.init_retries):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.devices()[0].platform)"],
                capture_output=True, text=True, timeout=args.init_timeout,
            )
            if r.returncode == 0:
                return
            last = (r.stderr or r.stdout or "unknown init failure").strip()
        except subprocess.TimeoutExpired:
            last = f"backend init hang (>{args.init_timeout}s, no response)"
        if attempt < args.init_retries - 1:
            time.sleep(args.init_backoff * (attempt + 1))
    _emit_outage(args, last)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--mode",
        default="translate",
        choices=[
            "translate", "translate-alternate", "translate-ddim",
            "translate-dpm", "sample", "train", "seg-infer",
        ],
    )
    p.add_argument("--steps", type=int, default=None,
                   help="default: 1000 (50 for translate-ddim, 20 for "
                        "translate-dpm)")
    p.add_argument(
        "--batch", type=int, default=8,
        help="throughput batch; 8 saturates one v5e chip for this pipeline",
    )
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--sr", type=int, default=None,
                   help="SRGAN upscale factor for translate modes (default 2 "
                        "= 256px guidance, the north-star shape; 4 = 512px, "
                        "the reference translation.py shape for "
                        "apples-to-apples with scripts/baseline_torch.py)")
    p.add_argument("--quick", action="store_true",
                   help="translate-alternate only: measure steps//10 and "
                        "extrapolate (official runs measure the full length)")
    p.add_argument("--tiny", action="store_true", help="tiny models (CPU smoke)")
    p.add_argument("--platform", default=None, help="force jax platform (e.g. cpu)")
    p.add_argument("--init-retries", type=int, default=4,
                   help="backend-init probe attempts before recording an "
                        "outage (subprocess probes: init failures can hang, "
                        "not just raise)")
    p.add_argument("--init-timeout", type=float, default=120.0,
                   help="seconds before one init probe counts as hung")
    p.add_argument("--init-backoff", type=float, default=30.0,
                   help="base seconds between probes (linear backoff)")
    p.add_argument("--guidance-every", type=int, default=None,
                   help="apply guidance every k-th step with lam rescaled "
                        "by k to preserve the total guidance dose (parity "
                        "adjudicated by scripts/headline_parity_gate.py). "
                        "Default: 2 for the headline `translate` mode "
                        "(gate-passed), 1 elsewhere")
    p.add_argument("--guidance-space", default=None, choices=["sr", "latent"],
                   help="'sr' = reference semantics (seg CE on the SRGAN "
                        "upscale, translation.py:81); 'latent' = seg CE "
                        "directly at latent resolution, skipping the "
                        "per-step SRGAN (parity adjudicated by the same "
                        "gate). Default: latent for the headline "
                        "`translate` mode (gate-passed), sr elsewhere")
    p.add_argument("--reference-exact", action="store_true",
                   help="headline translate mode: force the reference-exact "
                        "schedule (guidance every step, SR space) instead "
                        "of the gate-passed parity-mode default")
    p.add_argument("--lcg-present-k", type=int, default=None,
                   help="translate-alternate: pack LCG's 19-class sweep into "
                        "K per-image slots holding the classes actually "
                        "present in each gt (bit-exact when K covers them "
                        "all — guidance/sgg.present_class_ids; truncation "
                        "beyond K adjudicated by headline_parity_gate.py "
                        "--style alternate). Default: full 19-class sweep")
    p.add_argument("--scene-classes", type=int, default=None,
                   help="draw each bench gt as a blocky scene over N "
                        "distinct classes per image (urban scenes carry "
                        "~8-14 of the 19 train classes) instead of the "
                        "default uniform-random gt where all 19 classes "
                        "appear in every image. Only the packed-LCG cost "
                        "depends on gt content; the default stays "
                        "uniform-random for comparability with prior rounds")
    p.add_argument("--no-int8-attn", action="store_true",
                   help="disable the int8-QK^T flash-attention inference path "
                        "(default ON for the forward-only translate/sample "
                        "modes on TPU; training always uses exact bf16). "
                        "Quality impact validated in situ: see PROFILE.md r4")
    return p.parse_args()


def main():
    args = parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    if args.platform != "cpu":
        _probe_backend(args)
    try:
        _run(args)
    except Exception as e:  # noqa: BLE001 — filtered: only outages downgrade
        if _OUTAGE_PAT.search(f"{type(e).__name__}: {e}"):
            # mid-run backend death (e.g. tunnel drop between probe and the
            # timed window) — record it as an outage, not a bench failure
            _emit_outage(args, f"{type(e).__name__}: {e}")
        raise


def _run(args):
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

    def force(x):
        """Force execution + completion (see module docstring)."""
        return float(jnp.sum(jnp.asarray(x, dtype=jnp.float32)))

    dev = jax.devices()[0]
    on_tpu = dev.platform in ("tpu", "axon")
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    def mfu_of(program, per_step_sec):
        """MFU for the official programs (VERDICT r3 item 4): FLOPs from the
        scripts/mfu.py artifact (XLA HLO cost analysis at production shapes,
        B=8), peak = 197 TFLOP/s bf16 (v5e). None when the run isn't one of
        the counted programs (tiny/CPU/odd batch) or the artifact is absent."""
        if args.tiny or not on_tpu or args.batch != 8:
            return None
        try:
            with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "outputs", "mfu_r06.json")) as fh:
                prog = json.load(fh)["programs"].get(program)
            if prog is None:
                return None
            return round(prog["gflops_per_step"] * 1e9 / per_step_sec / 197e12, 4)
        except (OSError, KeyError, ValueError):
            return None

    # forward-only modes take the int8-QK^T flash path on TPU (2x MXU rate at
    # the UNet's D=64 head depth); `train` differentiates through attention
    # and always keeps the exact bf16 kernel with its custom VJP
    if (on_tpu and not args.no_int8_attn
            and args.mode in ("translate", "translate-alternate",
                              "translate-ddim", "translate-dpm", "sample")):
        os.environ.setdefault("WCTPU_ATTN_QK_INT8", "1")

    if args.tiny:
        ucfg = UnetModelConfig(
            im_size=16, down_channels=[8, 16, 24], mid_channels=[24, 24, 16],
            down_sample=[True, False], time_emb_dim=16, num_down_layers=1,
            num_mid_layers=1, num_up_layers=1, num_heads=2, attn_resolutions=[8],
        )
        steps = min(args.steps or 1000, 8)
        seg_name, sr_factor = "deeplabv3plus_resnet18", (args.sr or 2)
    else:
        ucfg = UnetModelConfig()  # production 128px ladder
        steps = args.steps if args.steps is not None else 1000
        seg_name, sr_factor = "deeplabv3plus_resnet101", (args.sr or 2)

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
        force(f(uparams, jax.random.PRNGKey(1)))  # compile
        times = []
        for i in range(args.repeats):
            k = jax.random.PRNGKey(2 + i)
            force(k)
            t0 = time.perf_counter()
            force(f(uparams, k))
            times.append(time.perf_counter() - t0)
        best = min(times)
        value = B * 60.0 / best
        print(json.dumps({
            "metric": f"unconditional_{H}px_{steps}step_samples_per_min_per_chip",
            "value": round(value, 3), "unit": "samples/min/chip",
            "vs_baseline": round(value / 20.0, 3),
        }))
        return

    if args.mode == "seg-infer":
        # BASELINE.json config 3: DeepLabV3+ 19-class inference (the
        # reference runs 512px; the bench uses the 512px plane too)
        from weatherconverter_tpu.models.factory import make_seg_model

        hw = 64 if args.tiny else 512
        name = "deeplabv3plus_resnet18" if args.tiny else "deeplabv3plus_resnet101"
        seg = make_seg_model(name, num_classes=19, train=False, dtype=dtype)
        sv = jax.jit(seg.init)(jax.random.PRNGKey(3), jnp.zeros((1, hw, hw, 3)))

        def run(v, key):
            imgs = jax.random.normal(key, (B, hw, hw, 3))
            def body(c, i):
                logits = seg.apply(v, c)
                return c * 0.999 + 0.001 * logits[..., :3], None
            return jax.lax.scan(body, imgs, jnp.arange(20))[0]

        f = jax.jit(run)
        force(f(sv, jax.random.PRNGKey(1)))
        times = []
        for i in range(args.repeats):
            key = jax.random.PRNGKey(2 + i)
            force(key)
            t0 = time.perf_counter()
            force(f(sv, key))
            times.append(time.perf_counter() - t0)
        per_img = min(times) / (20 * B)
        value = 1.0 / per_img
        print(json.dumps({
            "metric": f"seg_infer_{hw}px_images_per_sec_per_chip",
            "value": round(value, 3), "unit": "img/s/chip",
            "vs_baseline": round(value / 20.0, 3),
        }))
        return

    if args.mode == "train":
        from weatherconverter_tpu.training.diffusion import create_ddpm_state, make_train_step

        state = create_ddpm_state(unet, jax.random.PRNGKey(0), im_size=H, lr=1e-4)
        step = make_train_step(sched, mesh=None, donate=True)
        images = jax.random.normal(jax.random.PRNGKey(1), (B, H, H, 3))
        state, loss = step(state, images, jax.random.PRNGKey(2))  # compile
        force(loss)
        n = 20
        # min over repeats like every other mode (single-window runs showed
        # +-4% run-to-run variance on the tunneled backend)
        best = 1e9
        for r in range(args.repeats):
            t0 = time.perf_counter()
            for i in range(n):
                state, loss = step(state, images, jax.random.PRNGKey(3 + n * r + i))
            force(loss)
            best = min(best, (time.perf_counter() - t0) / n)
        value = B / best
        rec = {
            "metric": f"ddpm_train_{H}px_images_per_sec_per_chip",
            "value": round(value, 3), "unit": "img/s/chip",
            "vs_baseline": round(value / 20.0, 3),
        }
        mfu = mfu_of("train", best)
        if mfu is not None:
            rec["mfu"] = mfu
        print(json.dumps(rec))
        return

    # --- translate (headline) / -alternate / -ddim / -dpm ---
    from weatherconverter_tpu.guidance.translate import (
        sample_with_sgg,
        sample_with_sgg_ddim,
        sample_with_sgg_dpm,
    )
    from weatherconverter_tpu.models.factory import make_seg_model
    from weatherconverter_tpu.models.srgan import Generator

    HR = H * sr_factor
    seg = make_seg_model(seg_name, num_classes=19, train=False, dtype=dtype)
    seg_vars = jax.jit(seg.init)(jax.random.PRNGKey(3), jnp.zeros((1, HR, HR, 3)))

    gen = Generator(upscale_factor=sr_factor, dtype=dtype)
    gvars = jax.jit(gen.init)(jax.random.PRNGKey(4), jnp.zeros((1, H, H, 3)))

    if args.scene_classes is not None:
        # blocky per-image scenes over N distinct classes (8x8 block grid;
        # with 64 blocks from N<=14 classes every palette class appears
        # w.h.p., so --lcg-present-k N is the bit-exact packing for this gt)
        n_sc = args.scene_classes
        kg1, kg2 = jax.random.split(jax.random.PRNGKey(6))
        palette = jax.vmap(lambda k: jax.random.permutation(k, 19)[:n_sc])(
            jax.random.split(kg1, B)
        )  # (B, n_sc) distinct ids per image
        blocks = jax.random.randint(kg2, (B, 8, 8), 0, n_sc)
        picks = jnp.take_along_axis(
            palette, blocks.reshape(B, -1), axis=1
        ).reshape(B, 8, 8)
        gt = jnp.repeat(jnp.repeat(picks, HR // 8, 1), HR // 8, 2)
    else:
        gt = jax.random.randint(jax.random.PRNGKey(6), (B, HR, HR), 0, 19)

    if args.mode in ("translate-ddim", "translate-dpm"):
        # fast-serving extensions: full-quality-budget solver subsequences —
        # DDIM (1st order, 50 steps default) or DPM-Solver++(2M) (2nd order,
        # 20 steps default reach comparable quality); --steps overrides
        is_dpm = args.mode == "translate-dpm"
        fast_steps = args.steps if args.steps is not None else (20 if is_dpm else 50)

        def run(up, sv, gv, g, k):
            k1, k2 = jax.random.split(k)
            inp = jax.random.normal(k1, (B, H, H, 3)) * 0.2
            fn = sample_with_sgg_dpm if is_dpm else sample_with_sgg_ddim
            return fn(
                lambda xt, tt: unet.apply({"params": up}, xt, tt), sched,
                lambda img: seg.apply(sv, img), lambda img: gen.apply(gv, img),
                inp, g, k2, lam=60.0, num_steps=fast_steps,
                num_classes=19, guidance_style="gsg",
            )

        f = jax.jit(run)
        force(f(uparams, seg_vars, gvars, gt, jax.random.PRNGKey(7)))
        times = []
        for i in range(args.repeats):
            k = jax.random.PRNGKey(8 + i)
            force(k)
            t0 = time.perf_counter()
            force(f(uparams, seg_vars, gvars, gt, k))
            times.append(time.perf_counter() - t0)
        value = B * 60.0 / min(times)
        tag = "dpm2m" if is_dpm else "ddim"
        print(json.dumps({
            "metric": f"guided_{HR}px_{fast_steps}step_{tag}_translations_per_min_per_chip",
            "value": round(value, 3), "unit": "translations/min/chip",
            "vs_baseline": round(value / 20.0, 3),
        }))
        return

    style = "alternate" if args.mode == "translate-alternate" else "gsg"
    # VERDICT r1 item 6: the official alternate number is measured at FULL
    # length; --quick restores the old steps//10 extrapolation for smokes
    bench_steps = steps if style == "gsg" or not args.quick else max(steps // 10, 2)

    # guidance-dose-preserving throughput levers (VERDICT r2 item 1):
    # lam scales with guidance_every so the summed lam*sigma_t*||grad||
    # over the chain matches the every-step schedule. The headline mode
    # defaults to the fastest gate-passed variant (gevery2 + latent-space
    # guidance, outputs/headline_parity_r06.json); --reference-exact or the
    # explicit flags override. Other modes default to exact semantics.
    # parity-mode default only at the north-star shape (sr=2): the gate
    # artifact adjudicated pool=2 latent guidance, not the 4x reference shape
    headline = (args.mode == "translate" and not args.reference_exact
                and sr_factor == 2)
    g_every = args.guidance_every if args.guidance_every is not None else (
        2 if headline else 1)
    g_space = args.guidance_space if args.guidance_space is not None else (
        "latent" if headline else "sr")
    if args.reference_exact:
        g_every, g_space = 1, "sr"
    g_every = max(1, g_every)
    lam_eff = 60.0 * g_every
    variant = dict(guidance_every=g_every, guidance_space=g_space)
    var_tag = ""
    if g_every != 1:
        var_tag += f"_gevery{g_every}"
    if g_space != "sr":
        var_tag += f"_g{g_space}"
    if args.lcg_present_k is not None:
        variant["lcg_present_k"] = args.lcg_present_k
        var_tag += f"_lcgk{args.lcg_present_k}"
    if args.scene_classes is not None:
        var_tag += f"_scene{args.scene_classes}"

    diff_fn_of = lambda up: (lambda xt, tt: unet.apply({"params": up}, xt, tt))
    seg_fn_of = lambda sv: (lambda img: seg.apply(sv, img))
    sr_fn_of = lambda gv: (lambda img: gen.apply(gv, img))

    # The tunneled backend kills single executions past ~60 s; the full-length
    # alternate chain is ~76 s in one call. Segment it into SEG-step jitted
    # calls chained through the carried latent (identical semantics,
    # guidance/translate.py xt_init/t_offset) — the timed window covers all
    # `steps` real steps INCLUDING the inter-call dispatch overhead.
    SEG = 100
    # segment whenever one call would run past the backend's kill window:
    # the full-length alternate chain (~76 s), and ANY full-length chain at
    # sr>2 (512px guidance is ~4x the 256px per-step cost → ~100 s single-call,
    # which is what timed out the first --sr 4 attempt, rc=124)
    segmented = (not args.quick and bench_steps >= 2 * SEG
                 and (style == "alternate" or sr_factor > 2))

    if segmented:
        # first segment absorbs the remainder so EVERY step is executed for
        # any --steps value (nseg*SEG + first_len == bench_steps exactly;
        # a floor-divide here silently dropped bench_steps % SEG steps while
        # still dividing time by the full count — review round 4)
        nseg = (bench_steps - 1) // SEG  # SEG-sized continuations
        first_len = bench_steps - nseg * SEG  # in (0, SEG]

        def first_run(up, sv, gv, g, k):
            k1, k2 = jax.random.split(k)
            inp = jax.random.normal(k1, (B, H, H, 3)) * 0.2
            return sample_with_sgg(
                diff_fn_of(up), sched, seg_fn_of(sv), sr_fn_of(gv), inp, g, k2,
                lam=lam_eff, num_steps=first_len, num_classes=19, mode="fixed",
                start_t=bench_steps - 1, guidance_style=style,
                t_offset=bench_steps - first_len, final_sr=False, **variant,
            )

        def seg_run(up, sv, gv, g, xt, off, k):
            return sample_with_sgg(
                diff_fn_of(up), sched, seg_fn_of(sv), sr_fn_of(gv), xt, g, k,
                lam=lam_eff, num_steps=SEG, num_classes=19, mode="fixed",
                guidance_style=style, xt_init=xt, t_offset=off, final_sr=False,
                **variant,
            )

        first_j = jax.jit(first_run)
        seg_j = jax.jit(seg_run)
        sr_j = jax.jit(lambda gv, x0: gen.apply(gv, x0))

        def chain(kbase):
            xt, kc = first_j(uparams, seg_vars, gvars, gt, kbase)
            for s in range(nseg):
                off = jnp.int32(bench_steps - first_len - (s + 1) * SEG)
                xt, kc = seg_j(uparams, seg_vars, gvars, gt, xt, off, kc)
            return sr_j(gvars, xt)

        force(chain(jax.random.PRNGKey(7)))
        times = []
        for i in range(args.repeats):
            k = jax.random.PRNGKey(8 + i)
            force(k)
            t0 = time.perf_counter()
            force(chain(k))
            times.append(time.perf_counter() - t0)
        per_step = min(times) / bench_steps
    else:
        def run(up, sv, gv, g, k):
            k1, k2 = jax.random.split(k)
            inp = jax.random.normal(k1, (B, H, H, 3)) * 0.2
            return sample_with_sgg(
                diff_fn_of(up), sched, seg_fn_of(sv), sr_fn_of(gv), inp, g, k2,
                lam=lam_eff, num_steps=bench_steps, num_classes=19, mode="fixed",
                start_t=bench_steps - 1, guidance_style=style, **variant,
            )

        f = jax.jit(run)
        force(f(uparams, seg_vars, gvars, gt, jax.random.PRNGKey(7)))
        times = []
        for i in range(args.repeats):
            k = jax.random.PRNGKey(8 + i)
            force(k)
            t0 = time.perf_counter()
            force(f(uparams, seg_vars, gvars, gt, k))
            times.append(time.perf_counter() - t0)
        per_step = min(times) / bench_steps

    # per-step time extrapolated to the full `steps`-step translation
    # (no extrapolation when bench_steps == steps — the official runs)
    value = B * 60.0 / (per_step * steps)
    suffix = ("_alternate_lcg_gsg" if style == "alternate" else "") + var_tag
    rec = {
        "metric": f"guided_{HR}px_{steps}step_translations_per_min_per_chip{suffix}",
        "value": round(value, 3), "unit": "translations/min/chip",
        "vs_baseline": round(value / 20.0, 3),
    }
    if sr_factor == 2 and args.lcg_present_k is None:
        program = {
            ("gsg", 1, "sr"): "translate_exact",
            ("gsg", 2, "latent"): "translate_headline",
            ("alternate", 1, "sr"): "translate_alternate",
        }.get((style, g_every, g_space))
        if program is not None:
            mfu = mfu_of(program, per_step)
            if mfu is not None:
                rec["mfu"] = mfu
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
