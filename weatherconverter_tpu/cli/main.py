"""Unified CLI: `python -m weatherconverter_tpu.cli.main <command> ...`.

The reference ships per-script entry points with hardcoded config paths
(reference: run_train.sh:3-5; train_ddpm.py:26; translation.py:105-120 —
argparse imported but never wired, sample_ddpm.py:3). This framework has one
real CLI with subcommands mapping 1:1 onto the reference's scripts:

  train-ddpm   <- diffusion_model/train_ddpm.py
  train-seg    <- seg_model/train.py
  sample       <- diffusion_model/sample_ddpm.py (ddpm | ddim | legacy)
  infer-seg    <- seg_model/inference.py
  translate    <- translation.py (guided SGG pipeline)
  visualize    <- diffusion_model/visualizer.py (forward/backward strips)
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="weatherconverter-tpu")
    sub = p.add_subparsers(dest="command", required=True)

    t = sub.add_parser("train-ddpm", help="train the DDPM UNet")
    t.add_argument("--config", default=None, help="diffusion config YAML")
    t.add_argument("--max-steps", type=int, default=None)
    t.add_argument("--set", nargs="*", default=[], help="dotted overrides k=v")

    s = sub.add_parser("train-seg", help="train DeepLabV3(+) segmentation")
    s.add_argument("--config", default=None, help="seg config YAML")
    s.add_argument("--max-steps", type=int, default=None)
    s.add_argument("--set", nargs="*", default=[])

    sg = sub.add_parser("train-srgan", help="train Swift-SRGAN (pretrain + adversarial)")
    sg.add_argument("--config", default=None, help="srgan train config YAML")
    sg.add_argument("--max-steps", type=int, default=None)
    sg.add_argument("--set", nargs="*", default=[])

    sr = sub.add_parser("super-resolve", help="SRGAN 4x upscale of an image (reference srgan_model/inference.py)")
    sr.add_argument("--config", default=None, help="translation config YAML (srgan section)")
    sr.add_argument("--image", required=True)
    sr.add_argument("--checkpoint", default=None, help="torch .pth.tar / orbax dir / .npz")
    sr.add_argument("--out", default="outputs/super_resolved.png")

    sa = sub.add_parser("sample", help="unconditional DDPM sampling")
    sa.add_argument("--config", default=None)
    sa.add_argument("--checkpoint", default=None, help="orbax dir / .npz / torch .ckpt")
    sa.add_argument("--sampler", default="ddpm",
                    choices=["ddpm", "ddim", "dpm", "legacy"],
                    help="dpm = DPM-Solver++(2M), 2nd-order fast sampler "
                         "(10-25 steps; framework extension)")
    sa.add_argument("--steps", type=int, default=None)
    sa.add_argument("--batch", type=int, default=8)
    sa.add_argument("--out", default="outputs/samples/sample.png")
    sa.add_argument("--seed", type=int, default=0)
    sa.add_argument("--no-int8-attn", action="store_true",
                    help="keep exact bf16 flash attention (default on TPU: "
                         "int8 QK^T, 2x MXU rate — PROFILE.md round 4)")

    tr = sub.add_parser("translate", help="guided weather translation")
    tr.add_argument("--config", default=None, help="translation config YAML")
    tr.add_argument("--image", required=True, help="input image path")
    tr.add_argument("--label", required=True, help="gt labelIds path")
    tr.add_argument("--ddpm-checkpoint", default=None)
    tr.add_argument("--seg-checkpoint", default=None)
    tr.add_argument("--srgan-checkpoint", default=None)
    tr.add_argument("--out", default="outputs/translated.png")
    tr.add_argument("--mode", default="fixed", choices=["fixed", "reference"])
    tr.add_argument("--lambda", dest="lam", type=float, default=60.0)
    tr.add_argument("--steps", type=int, default=None,
                    help="default: 500 (the reference's N, translation.py:56); 50 for --sampler ddim")
    tr.add_argument("--seed", type=int, default=0)
    tr.add_argument("--sampler", default="ddpm", choices=["ddpm", "ddim", "dpm"],
                    help="ddim / dpm = few-step guided translation (framework "
                         "extensions; dpm = 2nd-order DPM-Solver++(2M))")
    tr.add_argument("--eta", type=float, default=0.0, help="DDIM noise scale")
    tr.add_argument("--span-t", type=int, default=None,
                    help="diffusion span the DDIM taus stride (default: the translate "
                         "span cfg.guidance.num_steps, which preserves source content; "
                         "pass the schedule's full T for label-guided generation)")
    tr.add_argument("--no-int8-attn", action="store_true",
                    help="keep exact bf16 flash attention (default on TPU: "
                         "int8 QK^T, 2x MXU rate — PROFILE.md round 4)")
    tr.add_argument("--lcg-present-k", default="auto",
                    help="pack LCG's 19-class sweep into K per-image slots "
                         "holding the classes present in the gt. 'auto' "
                         "(default) counts the label's distinct train-ids — "
                         "BIT-EXACT vs the full sweep, ~19/n_present faster "
                         "on the LCG steps (PROFILE.md round 6); an integer "
                         "truncates to the K largest-by-area classes "
                         "(semantics adjudicated by headline_parity_gate "
                         "--style alternate); 'off' = full 19-class sweep")
    tr.add_argument("--debug-dir", default=None,
                    help="dump per-chain intermediates (input/gt/noised xt/"
                         "xt snapshots/final SR + seg pred) to this dir — "
                         "analog of the reference's debug_tensor hooks "
                         "(translation.py:17-39,58-92); ddpm sampler only")
    tr.add_argument("--debug-every", type=int, default=100,
                    help="snapshot cadence in reverse steps (chain runs in "
                         "bit-identical jitted segments between dumps)")

    iv = sub.add_parser("infer-seg", help="segmentation inference + gradient probe")
    iv.add_argument("--config", default=None)
    iv.add_argument("--checkpoint", default=None)
    iv.add_argument("--image", required=True)
    iv.add_argument("--label", default=None)
    iv.add_argument("--out", default="outputs/seg")

    q = sub.add_parser("quality", help="translation quality gates: FID + mIoU-consistency")
    q.add_argument("--config", default=None, help="translation config YAML")
    q.add_argument("--images", default=None,
                   help="paired dataset dir: ACDC *_rgb_anon/*_gt_labelIds "
                        "naming anywhere under it, or rgb/ + gt/ subdirs "
                        "(omit for --synthetic)")
    q.add_argument("--synthetic", type=int, default=8, help="N seeded random inputs when no --images")
    q.add_argument("--ddpm-checkpoint", default=None)
    q.add_argument("--seg-checkpoint", default=None)
    q.add_argument("--inception-checkpoint", default=None,
                   help="torchvision-layout inception_v3 .pth for true FID; else backbone-FID")
    q.add_argument("--guidance", default="gsg", choices=["gsg", "lcg", "alternate", "none"])
    q.add_argument("--lambda", dest="lam", type=float, default=60.0)
    q.add_argument("--steps", type=int, default=100)
    q.add_argument("--batch", type=int, default=4)
    q.add_argument("--seed", type=int, default=0)
    q.add_argument("--out", default=None, help="write the JSON report here")

    sv = sub.add_parser("serve", help="micro-batched HTTP inference server")
    sv.add_argument("--config", default=None, help="translation config YAML")
    sv.add_argument("--port", type=int, default=8700)
    sv.add_argument("--batch", type=int, default=4, help="compiled serving batch")
    sv.add_argument("--steps", type=int, default=None)
    sv.add_argument("--sampler", default="ddpm", choices=["ddpm", "ddim", "dpm"],
                    help="ddim / dpm = few-step fast translation for serving "
                         "latency (dpm = 2nd-order DPM-Solver++(2M), ~20 steps)")
    sv.add_argument("--max-wait-ms", type=float, default=25.0)
    sv.add_argument("--lcg-present-k", default=None,
                    help="LCG class-slot count for the compiled serving "
                         "program: an int = ONE static K (bit-exact for "
                         "labels with <= K classes, truncates otherwise); "
                         "'auto' = bucketed covering-K — each request routes "
                         "to the smallest compiled K bucket covering its "
                         "label's class count (always bit-exact, mixed-scene "
                         "batches stop paying max-K); default: full sweep")
    sv.add_argument("--lcg-k-buckets", default="4,8,12",
                    help="compiled K ladder for --lcg-present-k auto "
                         "(num_classes is always appended as the top bucket)")
    sv.add_argument("--ddpm-checkpoint", default=None)
    sv.add_argument("--seg-checkpoint", default=None)
    sv.add_argument("--srgan-checkpoint", default=None)
    sv.add_argument("--no-int8-attn", action="store_true",
                    help="keep exact bf16 flash attention (default on TPU: "
                         "int8 QK^T, 2x MXU rate — PROFILE.md round 4)")

    eh = sub.add_parser("export-hlo", help="export the jitted inference "
                        "program as StableHLO (deployment artifact)")
    eh.add_argument("--config", default=None, help="translation config YAML")
    eh.add_argument("--program", default="translate",
                    choices=["translate", "sample"])
    eh.add_argument("--steps", type=int, default=None,
                    help="reverse steps baked into the program (default: "
                         "cfg.guidance.num_steps)")
    eh.add_argument("--batch", type=int, default=8)
    eh.add_argument("--out", default="outputs/translate.stablehlo.mlir")
    eh.add_argument("--attn", default="bf16", choices=["bf16", "int8"],
                    help="attention variant baked into the export. Explicit, "
                         "never inferred from the exporting host's platform: "
                         "'bf16' is portable StableHLO; 'int8' embeds the "
                         "TPU-only Mosaic custom-calls of the int8-QK^T "
                         "kernel (serving default on TPU) and only loads on "
                         "a TPU runtime")

    vz = sub.add_parser("visualize", help="forward/backward process strips")
    vz.add_argument("--config", default=None)
    vz.add_argument("--image", required=True)
    vz.add_argument("--checkpoint", default=None)
    vz.add_argument("--out", default="outputs/strips")
    vz.add_argument("--every", type=int, default=100)
    return p


def parse_overrides(pairs):
    out = {}
    for pair in pairs:
        k, _, v = pair.partition("=")
        cur = out
        parts = k.split(".")
        for part in parts[:-1]:
            cur = cur.setdefault(part, {})
        try:
            import json

            cur[parts[-1]] = json.loads(v)
        except Exception:
            cur[parts[-1]] = v
    return out


def _honor_env_platform() -> None:
    """This image's jax build defaults to the axon TPU tunnel regardless of
    JAX_PLATFORMS; apply the env var via the config API so CPU runs work."""
    import os

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache — full-size pipeline compiles take
    minutes on the tunneled TPU backend; cache them across CLI invocations."""
    import os

    import jax

    try:
        cache_dir = os.path.expanduser("~/.cache/jax_compcache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main(argv=None) -> int:
    _honor_env_platform()
    from weatherconverter_tpu.parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed()  # no-op single-host; multi-host DP otherwise
    _enable_compilation_cache()
    args = build_parser().parse_args(argv)
    if args.command == "train-ddpm":
        from weatherconverter_tpu.core.config import load_diffusion_config
        from weatherconverter_tpu.training import loop_diffusion

        cfg = load_diffusion_config(args.config, **parse_overrides(args.set))
        loop_diffusion.train(cfg, max_steps=args.max_steps)
        return 0
    if args.command == "train-seg":
        from weatherconverter_tpu.core.config import load_seg_config
        from weatherconverter_tpu.training import loop_segmentation

        cfg = load_seg_config(args.config, **parse_overrides(args.set))
        loop_segmentation.train(cfg, max_steps=args.max_steps)
        return 0
    if args.command == "train-srgan":
        from weatherconverter_tpu.core.config import load_srgan_train_config
        from weatherconverter_tpu.training import loop_srgan

        cfg = load_srgan_train_config(args.config, **parse_overrides(args.set))
        loop_srgan.train(cfg, max_steps=args.max_steps)
        return 0
    if args.command == "super-resolve":
        from weatherconverter_tpu.cli.commands import run_super_resolve

        return run_super_resolve(args)
    if args.command == "sample":
        from weatherconverter_tpu.cli.commands import run_sample

        return run_sample(args)
    if args.command == "translate":
        from weatherconverter_tpu.cli.commands import run_translate

        return run_translate(args)
    if args.command == "quality":
        from weatherconverter_tpu.cli.commands import run_quality

        return run_quality(args)
    if args.command == "infer-seg":
        from weatherconverter_tpu.cli.commands import run_infer_seg

        return run_infer_seg(args)
    if args.command == "serve":
        from weatherconverter_tpu.cli.commands import _enable_int8_attn_inference
        from weatherconverter_tpu.core.config import load_translation_config
        from weatherconverter_tpu.serving.server import TranslationService, serve

        _enable_int8_attn_inference(args)
        cfg = load_translation_config(args.config)
        k = args.lcg_present_k
        if k is not None and k != "auto":
            try:
                k = int(k)
            except ValueError:
                raise SystemExit(
                    f"--lcg-present-k must be an int or 'auto'; got {k!r}"
                )
        try:
            buckets = tuple(int(b) for b in str(args.lcg_k_buckets).split(",") if b)
        except ValueError:
            raise SystemExit(
                f"--lcg-k-buckets must be comma-separated ints; got {args.lcg_k_buckets!r}"
            )
        service = TranslationService(
            cfg, args.ddpm_checkpoint, args.seg_checkpoint, args.srgan_checkpoint,
            batch=args.batch, steps=args.steps, max_wait_ms=args.max_wait_ms,
            sampler=args.sampler, lcg_present_k=k, lcg_k_buckets=buckets,
        )
        print(
            f"serving on :{args.port} (batch={args.batch}, "
            f"steps={service.steps}, sampler={args.sampler})"
        )
        serve(service, args.port)
        return 0
    if args.command == "export-hlo":
        from weatherconverter_tpu.cli.commands import run_export_hlo

        return run_export_hlo(args)
    if args.command == "visualize":
        from weatherconverter_tpu.cli.commands import run_visualize

        return run_visualize(args)
    return 1


if __name__ == "__main__":
    sys.exit(main())
