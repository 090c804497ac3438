"""CLI subcommand implementations (sample / translate / infer-seg /
visualize). Each mirrors one reference entry point; see cli/main.py for the
mapping table."""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


def _enable_int8_attn_inference(args) -> None:
    """Forward-only commands default to the int8-QK^T flash-attention path on
    real TPU hardware (2x MXU rate at the UNet's D=64 head depth; quality
    validated in situ — PROFILE.md round 4). Training commands never call
    this: the int8 pallas_call has no VJP, training keeps exact bf16.
    Opt out with --no-int8-attn."""
    if getattr(args, "no_int8_attn", False):
        # explicit "0", not an early return: the opt-out must also override a
        # WCTPU_ATTN_QK_INT8=1 already exported in the shell (ADVICE r2)
        os.environ["WCTPU_ATTN_QK_INT8"] = "0"
        return
    if jax.devices()[0].platform in ("tpu", "axon"):
        os.environ.setdefault("WCTPU_ATTN_QK_INT8", "1")


def _load_unet_params(model, checkpoint, cfg, key):
    """Checkpoint may be a torch .ckpt (bridged via compat), an orbax dir, an
    .npz, or None (random init — useful for smoke runs)."""
    init = lambda: jax.jit(model.init)(
        key,
        jnp.zeros((1, cfg.model.im_size, cfg.model.im_size, 3)),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    if checkpoint is None:
        return init()
    if checkpoint.endswith((".ckpt", ".pt", ".pth")):
        from weatherconverter_tpu.compat.torch_import import (
            convert_unet,
            load_torch_checkpoint,
        )

        return convert_unet(load_torch_checkpoint(checkpoint), cfg.model)
    if checkpoint.endswith(".npz"):
        from weatherconverter_tpu.core.checkpoint import load_pytree_npz

        return load_pytree_npz(checkpoint, init())
    import os

    if os.path.isdir(checkpoint) and any(d.isdigit() for d in os.listdir(checkpoint)):
        # training-run checkpoints dir: restore the saved DDPMTrainState raw
        # and prefer its EMA shadow over the live params when present
        from weatherconverter_tpu.core.checkpoint import CheckpointManager

        mgr = CheckpointManager(checkpoint)
        raw = mgr.restore(target=None)
        mgr.close()
        ema = raw.get("ema") if isinstance(raw, dict) else None
        if ema and ema.get("params") is not None:
            return jax.tree.map(jnp.asarray, ema["params"])
        return jax.tree.map(jnp.asarray, raw["params"])
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer().restore(checkpoint, init())


def run_sample(args) -> int:
    from weatherconverter_tpu.core.config import load_diffusion_config
    from weatherconverter_tpu.diffusion.sampling import (
        ddim_sample,
        ddpm_sample,
        ddpm_sample_legacy,
        dpm_solver_pp_2m_sample,
    )
    from weatherconverter_tpu.diffusion.schedule import make_schedule
    from weatherconverter_tpu.models.unet import Unet
    from weatherconverter_tpu.models.unet_legacy import LegacyUNet
    from weatherconverter_tpu.utils.images import save_images

    cfg = load_diffusion_config(args.config)
    _enable_int8_attn_inference(args)
    sched = make_schedule(
        cfg.diffusion.schedule, cfg.diffusion.num_timesteps,
        cfg.diffusion.beta_start, cfg.diffusion.beta_end,
    )
    key = jax.random.PRNGKey(args.seed)
    on_tpu = jax.devices()[0].platform == "tpu"
    shape = (args.batch, cfg.model.im_size, cfg.model.im_size, cfg.model.im_channels)

    if args.sampler == "legacy":
        model = LegacyUNet(image_size=cfg.model.im_size)
        if args.checkpoint and args.checkpoint.endswith((".pth", ".pt", ".ckpt", ".tar")):
            # the shipped reference artifact: old_model/1000-checkpoint.ckpt
            # (reference sample_integrated.py:89)
            from weatherconverter_tpu.compat.torch_import import (
                convert_legacy_unet,
                load_torch_checkpoint,
            )

            params, stats = convert_legacy_unet(load_torch_checkpoint(args.checkpoint))
            variables = {"params": jax.tree.map(jnp.asarray, params),
                         "batch_stats": jax.tree.map(jnp.asarray, stats)}
        else:
            variables = jax.jit(model.init)(
                key, jnp.zeros((1,) + shape[1:]), jnp.zeros((1,))
            )

        @jax.jit
        def run(v, k):
            fn = lambda x, t: model.apply(v, x, t)
            return ddpm_sample_legacy(fn, sched, k, shape, num_steps=args.steps)

        out = run(variables, key)
    else:
        model = Unet(config=cfg.model, fused=on_tpu)
        params = _load_unet_params(model, args.checkpoint, cfg, key)

        @jax.jit
        def run(p, k):
            fn = lambda x, t: model.apply({"params": p}, x, t)
            if args.sampler == "ddim":
                return ddim_sample(fn, sched, k, shape, num_steps=args.steps or 50)
            if args.sampler == "dpm":
                return dpm_solver_pp_2m_sample(
                    fn, sched, k, shape, num_steps=args.steps or 20
                )
            return ddpm_sample(fn, sched, k, shape, num_steps=args.steps)

        out = run(params, key)
    path = save_images(out, args.out, nrow=4)
    print(f"saved {path}")
    return 0


def load_seg_variables(model, checkpoint, model_name, hw, key):
    """Init or restore seg model variables; torch .pth checkpoints bridge
    through compat (the reference loads `model_state_dict` at
    seg_model/inference.py:27-33)."""
    if checkpoint and checkpoint.endswith((".pth", ".pt", ".ckpt", ".tar")):
        from weatherconverter_tpu.compat.torch_import import (
            convert_deeplab,
            load_torch_checkpoint,
        )

        params, stats = convert_deeplab(load_torch_checkpoint(checkpoint), model_name)
        return {"params": params, "batch_stats": stats}
    variables = jax.jit(model.init)(key, jnp.zeros((1, hw[0], hw[1], 3)))
    if checkpoint:
        # .npz, a training-run checkpoints dir (picks the best-mIoU step,
        # reference seg train.py:257-260), or one orbax step dir
        from weatherconverter_tpu.core.checkpoint import restore_auto

        return restore_auto(checkpoint, variables, prefer_best=True)
    return variables


def _load_image(path, size):
    from PIL import Image

    img = Image.open(path).convert("RGB").resize((size, size), Image.BILINEAR)
    return np.asarray(img, dtype=np.float32) / 255.0


def _resolve_lcg_present_k(spec, gt, num_classes: int):
    """CLI --lcg-present-k: 'auto' = the count of distinct train-ids in the
    concrete label (bit-exact covering K, computed host-side because K is a
    static shape), 'off'/None = full sweep, integer = truncating K."""
    if spec in (None, "off"):
        return None
    if spec == "auto":
        k = int(np.unique(np.asarray(gt)[np.asarray(gt) != 255]).size)
        return min(max(k, 1), num_classes)
    try:
        k = int(spec)
    except ValueError:
        raise SystemExit(
            f"--lcg-present-k must be 'auto', 'off', or an integer; got {spec!r}"
        )
    if not 1 <= k <= num_classes:
        raise SystemExit(f"--lcg-present-k out of range 1..{num_classes}: {k}")
    return k


def _run_translate_debug(
    args, cfg, unet, uparams, sched, seg, seg_vars, gen, gvars, img, gt, key
) -> int:
    """Chain-intermediate dumps — analog of the reference's debug_tensor
    hooks (translation.py:17-39 and the commented per-step dumps at 58-92:
    input / gt / noised xt / xt_{i} / final SR).

    The reference prints from inside its Python sampling loop; our chain is
    one jitted scan, so a per-step host callback would serialize the
    pipeline. Instead the chain runs in `--debug-every`-step jitted segments
    through the bit-identical continuation contract (xt_init/t_offset,
    final_sr=False), dumping the carried latent between calls. The entry
    (key split -> random t0 -> q_sample) is replicated host-side exactly as
    sample_with_sgg's xt_init=None branch performs it, so the traced
    trajectory is step-for-step identical to the plain `translate` call with
    the same seed.
    """
    from functools import partial

    from weatherconverter_tpu.diffusion.schedule import q_sample
    from weatherconverter_tpu.guidance.translate import sample_with_sgg
    from weatherconverter_tpu.utils.debug import debug_tensor
    from weatherconverter_tpu.utils.images import save_images

    d = args.debug_dir
    steps = args.steps
    every = max(1, args.debug_every)
    x0_in = jnp.asarray(img)[None]
    gt_b = jnp.asarray(gt)[None]

    debug_tensor(x0_in, os.path.join(d, "input.png"), "input_tensor")
    debug_tensor(np.asarray(gt_b), os.path.join(d, "gt.png"), "gt")

    # entry replication: identical key consumption + q-sample to random t
    # (translate.py xt_init=None branch; reference translation.py:61-65)
    key, tkey, nkey = jax.random.split(key, 3)
    t0 = jax.random.randint(tkey, (x0_in.shape[0],), 0, steps)
    noise0 = jax.random.normal(nkey, x0_in.shape, dtype=x0_in.dtype)
    xt = q_sample(sched, x0_in, noise0, t0)
    debug_tensor(xt, os.path.join(d, f"xt_{steps}_noised.png"), "xt_noised")

    @partial(jax.jit, static_argnames=("n",))
    def seg_run(up, sv, gv, g_, xt_, off, k_, n):
        dfn = lambda x, t: unet.apply({"params": up}, x, t)
        sfn = lambda x: seg.apply(sv, x)
        gfn = lambda x: gen.apply(gv, x)
        return sample_with_sgg(
            dfn, sched, sfn, gfn, xt_, g_, k_, lam=args.lam, num_steps=n,
            num_classes=cfg.seg.model.num_classes, mode=args.mode,
            xt_init=xt_, t_offset=off, final_sr=False,
        )

    prev = steps
    for lo in range(((steps - 1) // every) * every, -1, -every):
        xt, key = seg_run(
            uparams, seg_vars, gvars, gt_b, xt, jnp.int32(lo), key,
            n=prev - lo,
        )
        # reference convention: xt_{i}.png = latent after processing step i
        debug_tensor(xt, os.path.join(d, f"xt_{lo}.png"), f"xt after step {lo}")
        prev = lo

    sr_out = jax.jit(gen.apply)(gvars, xt)
    debug_tensor(
        sr_out, os.path.join(d, "sr_x0.png"), "sr_x0", from_range="unit"
    )
    pred = np.asarray(
        jnp.argmax(jax.jit(seg.apply)(seg_vars, sr_out), axis=-1)
    ).astype(np.uint8)
    debug_tensor(pred, os.path.join(d, "sr_x0_pred.png"), "seg pred of output")

    save_images(sr_out, args.out, nrow=1, from_range="unit")
    print(f"saved {args.out} (debug dumps in {d})")
    return 0


def run_translate(args) -> int:
    """End-to-end guided translation (reference: translation.py:100-164)."""
    from weatherconverter_tpu.core.config import load_translation_config
    from weatherconverter_tpu.data.labels import encode_target
    from weatherconverter_tpu.diffusion.schedule import make_schedule
    from weatherconverter_tpu.guidance.translate import make_translate_fn
    from weatherconverter_tpu.models.factory import make_seg_model
    from weatherconverter_tpu.models.srgan import Generator
    from weatherconverter_tpu.models.unet import Unet
    from weatherconverter_tpu.utils.images import save_images
    from PIL import Image

    cfg = load_translation_config(args.config)
    on_tpu = jax.devices()[0].platform == "tpu"
    _enable_int8_attn_inference(args)
    key = jax.random.PRNGKey(args.seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    dcfg = cfg.diffusion
    size = dcfg.model.im_size
    sr_factor = cfg.srgan.upscale_factor
    hr = size * sr_factor

    unet = Unet(config=dcfg.model, fused=on_tpu)
    uparams = _load_unet_params(unet, args.ddpm_checkpoint, dcfg, k1)

    seg = make_seg_model(
        cfg.seg.model.name, cfg.seg.model.num_classes, cfg.seg.model.output_stride,
        train=False,
    )
    seg_vars = load_seg_variables(
        seg, args.seg_checkpoint, cfg.seg.model.name, (hr, hr), k2
    )

    gen = Generator(
        in_channels=cfg.srgan.in_channels, num_channels=cfg.srgan.num_channels,
        num_blocks=cfg.srgan.num_blocks, upscale_factor=sr_factor,
    )
    if args.srgan_checkpoint:
        from weatherconverter_tpu.compat.torch_import import (
            convert_srgan_generator,
            load_torch_checkpoint,
        )

        gp, gs = convert_srgan_generator(
            load_torch_checkpoint(args.srgan_checkpoint), cfg.srgan.num_blocks
        )
        gvars = {"params": gp, "batch_stats": gs}
    else:
        gvars = jax.jit(gen.init)(k3, jnp.zeros((1, size, size, 3)))

    sched = make_schedule(
        dcfg.diffusion.schedule, dcfg.diffusion.num_timesteps,
        dcfg.diffusion.beta_start, dcfg.diffusion.beta_end,
    )

    img = _load_image(args.image, size) * 2.0 - 1.0  # [-1,1] 128px input
    lbl = Image.open(args.label).resize((hr, hr), Image.NEAREST)
    gt = encode_target(np.asarray(lbl, dtype=np.uint8))

    # LCG present-class packing (guidance/sgg.present_class_ids). 'auto'
    # counts the concrete label's distinct train-ids HOST-SIDE (K must be a
    # static shape; the gt is fixed for the whole chain) — bit-exact vs the
    # full sweep because K covers every present class. Only the LCG steps of
    # the alternate schedule are affected; GSG-only paths ignore it.
    lcg_k = _resolve_lcg_present_k(
        getattr(args, "lcg_present_k", "off"), gt, cfg.seg.model.num_classes
    )

    # sampler-appropriate step defaults: the fast paths exist for FEW-step
    # translation (500 would negate their purpose; review round 3)
    sampler = getattr(args, "sampler", "ddpm")
    if getattr(args, "steps", None) is None:
        args.steps = {"ddim": 50, "dpm": 20}.get(sampler, 500)
    if getattr(args, "debug_dir", None):
        if sampler != "ddpm":
            raise SystemExit(
                "--debug-dir traces the DDPM reverse chain via its "
                "bit-identical segmentation (guidance/translate.py "
                "xt_init/t_offset); the few-step ddim/dpm trajectories have "
                "no segment continuation — use --sampler ddpm."
            )
        return _run_translate_debug(
            args, cfg, unet, uparams, sched, seg, seg_vars, gen, gvars,
            img, gt, k4,
        )
    if sampler in ("ddim", "dpm"):
        from weatherconverter_tpu.guidance.translate import (
            sample_with_sgg_ddim,
            sample_with_sgg_dpm,
        )

        if args.mode == "reference":
            # the DDPM path replicates the reference's overwrite defect; the
            # fast-solver paths have no reference analog, so this combination
            # silently produces UNGUIDED output. Refuse, like serving does
            # (serving/server.py raises the same) — a warning that scrolls by
            # is not consent to wrong output (ADVICE r2).
            raise SystemExit(
                f"--sampler {sampler} with --mode reference would disable "
                "guidance entirely (the reference's xt-overwrite defect has "
                "no fast-solver analog). Use --mode fixed for guided fast "
                "translation, or --sampler ddpm for the reference-defect "
                "replication."
            )
        # taus stride the TRANSLATE span (cfg.guidance.num_steps), not the
        # full T: q-sampling to t=T-1 destroys the source (advisor round 1)
        span_t = args.span_t if args.span_t is not None else cfg.guidance.num_steps

        @jax.jit
        def _fast_translate(up, sv, gv, i_, g_, k_):
            common = dict(
                lam=args.lam, num_steps=args.steps, span_t=span_t,
                num_classes=cfg.seg.model.num_classes, mode=args.mode,
                lcg_present_k=lcg_k,
            )
            dfn = lambda x, t: unet.apply({"params": up}, x, t)
            sfn = lambda x: seg.apply(sv, x)
            gfn = lambda x: gen.apply(gv, x)
            if sampler == "dpm":
                return sample_with_sgg_dpm(dfn, sched, sfn, gfn, i_, g_, k_, **common)
            return sample_with_sgg_ddim(
                dfn, sched, sfn, gfn, i_, g_, k_, eta=args.eta, **common
            )

        translate = lambda i_, g_, k_: _fast_translate(
            uparams, seg_vars, gvars, i_, g_, k_
        )
    else:
        translate = make_translate_fn(
            unet, uparams, sched, seg, seg_vars, gen, gvars,
            lam=args.lam, num_steps=args.steps, mode=args.mode,
            num_classes=cfg.seg.model.num_classes, lcg_present_k=lcg_k,
        )
    out = translate(jnp.asarray(img)[None], jnp.asarray(gt)[None], k4)
    save_images(out, args.out, nrow=1, from_range="unit")
    print(f"saved {args.out}")
    return 0


def run_super_resolve(args) -> int:
    """Standalone SRGAN upscale of one image (reference:
    srgan_model/inference.py:35-53 — preprocess to [0,1], no_grad forward,
    save PIL). The checkpoint may be the reference's torch .pth.tar (key
    'model', srgan inference.py:13), an Orbax run dir, or an .npz export."""
    from PIL import Image

    from weatherconverter_tpu.core.config import load_translation_config
    from weatherconverter_tpu.models.srgan import Generator

    cfg = load_translation_config(args.config)
    gen = Generator(
        in_channels=cfg.srgan.in_channels, num_channels=cfg.srgan.num_channels,
        num_blocks=cfg.srgan.num_blocks, upscale_factor=cfg.srgan.upscale_factor,
    )
    img = Image.open(args.image).convert("RGB")
    x = jnp.asarray(np.asarray(img, dtype=np.float32) / 255.0)[None]

    if args.checkpoint and (
        args.checkpoint.endswith((".pth", ".pth.tar", ".ckpt", ".pt"))
    ):
        from weatherconverter_tpu.compat.torch_import import (
            convert_srgan_generator,
            load_torch_checkpoint,
        )

        gp, gs = convert_srgan_generator(
            load_torch_checkpoint(args.checkpoint), cfg.srgan.num_blocks
        )
        gvars = {"params": gp, "batch_stats": gs}
    else:
        gvars = jax.jit(gen.init)(jax.random.PRNGKey(0), x)
        if args.checkpoint:
            from weatherconverter_tpu.core.checkpoint import restore_auto

            gvars = restore_auto(args.checkpoint, gvars, prefer_best=True)

    out = jax.jit(gen.apply)(gvars, x)
    # single image, no grid border (reference saves the PIL image directly,
    # srgan inference.py:42-53)
    from weatherconverter_tpu.utils.images import to_uint8_image

    arr = to_uint8_image(out, "unit")[0]
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    Image.fromarray(arr).save(args.out)
    print(f"saved {args.out} ({out.shape[2]}x{out.shape[1]})")
    return 0


def run_infer_seg(args) -> int:
    """Seg inference + input-gradient probe (reference: seg_model/
    inference.py:118-152 + 6-panel visualization 155-200)."""
    from weatherconverter_tpu.core.config import load_seg_config
    from weatherconverter_tpu.data.labels import decode_target, encode_target
    from weatherconverter_tpu.guidance.sgg import gradient_magnitude, seg_input_gradients
    from weatherconverter_tpu.models.factory import make_seg_model
    from weatherconverter_tpu.ops.image import normalize
    from PIL import Image

    cfg = load_seg_config(args.config)
    t = cfg.data.transform
    hw = tuple(t.target_resolution)
    model = make_seg_model(
        cfg.model.name, cfg.model.num_classes, cfg.model.output_stride, train=False
    )
    key = jax.random.PRNGKey(0)
    ckpt = args.checkpoint or cfg.model.path or None
    variables = load_seg_variables(
        model, ckpt, cfg.model.name, (hw[0], hw[1]), key
    )

    img = Image.open(args.image).convert("RGB").resize((hw[1], hw[0]), Image.BILINEAR)
    x = jnp.asarray(np.asarray(img, np.float32) / 255.0)[None]
    xn = normalize(x, tuple(t.mean), tuple(t.std))

    @jax.jit
    def infer(v, xn):
        logits = model.apply(v, xn)
        return logits, jnp.argmax(logits, -1)

    logits, pred = infer(variables, xn)
    os.makedirs(args.out, exist_ok=True)
    Image.fromarray(decode_target(np.asarray(pred[0]).astype(np.int32)).astype(np.uint8)).save(
        os.path.join(args.out, "pred.png")
    )

    if args.label:
        lbl = Image.open(args.label).resize((hw[1], hw[0]), Image.NEAREST)
        enc = encode_target(np.asarray(lbl, np.uint8))
        gt = jnp.asarray(enc)[None]
        seg_fn = lambda im: model.apply(variables, im)
        grads = seg_input_gradients(seg_fn, xn, gt)
        mag = gradient_magnitude(grads)
        m = np.asarray(mag[0, ..., 0])
        m = (m - m.min()) / max(m.max() - m.min(), 1e-12)
        Image.fromarray((m * 255).astype(np.uint8)).save(
            os.path.join(args.out, "gradient_magnitude.png")
        )
        # Reference's full debugging surface: the 6-panel comparison strip
        # (inference.py:155-200 visualize_samples — original image,
        # denormalized input tensor, colorized predictions, gradient
        # magnitude, encoded train-id label, gt colorized). One uint8 strip
        # image instead of a matplotlib figure; same panels, same order.
        pred_color = decode_target(np.asarray(pred[0]).astype(np.int32)).astype(np.uint8)
        gt_color = decode_target(enc.astype(np.int32)).astype(np.uint8)
        denorm = np.clip(np.asarray(x[0]), 0.0, 1.0)
        panels = [
            np.asarray(img, np.uint8),                    # original image
            (denorm * 255).astype(np.uint8),              # input tensor, denormalized
            pred_color,                                   # colorized predictions
            np.repeat((m * 255).astype(np.uint8)[..., None], 3, -1),  # grad magnitude
            # encoded train-id plane, scaled into visible range like
            # matplotlib's auto-normed imshow of the raw id tensor
            np.repeat(
                (np.where(enc == 255, 0, enc) * (255 // max(cfg.model.num_classes - 1, 1)))
                .astype(np.uint8)[..., None], 3, -1,
            ),
            gt_color,                                     # ground truth colorized
        ]
        strip = np.concatenate(panels, axis=1)
        Image.fromarray(strip).save(os.path.join(args.out, "panels.png"))
    print(f"saved outputs under {args.out}")
    return 0


def run_export_hlo(args) -> int:
    """Export the jitted inference program as StableHLO text — the
    deployment artifact for compile-once serving pipelines (load into any
    XLA-compatible runtime without Python or model code; a capability the
    torch reference has no analog of). Exports `translate` (the flagship
    four-model guided pipeline at the config's shapes and batch) or
    `sample` (the unconditional chain). Weights are NOT baked in: params are
    function ARGUMENTS in the exported module, exactly like the live jit
    path (closed-over weights would also stall this backend's compiler —
    CLAUDE.md rule 3).

    The attention variant is an EXPLICIT export flag, never inferred from the
    exporting host (ADVICE r2: a platform-dependent export contradicted the
    "any XLA runtime" claim): `--attn bf16` (default) lowers the plain XLA
    attention — pure portable StableHLO; `--attn int8` embeds the TPU-only
    Mosaic custom-calls of the int8-QK^T serving kernel and therefore
    requires a TPU backend to export and a TPU runtime to load."""
    from weatherconverter_tpu.core.config import load_translation_config
    from weatherconverter_tpu.diffusion.sampling import ddpm_sample
    from weatherconverter_tpu.diffusion.schedule import make_schedule
    from weatherconverter_tpu.guidance.translate import sample_with_sgg
    from weatherconverter_tpu.models.factory import make_seg_model
    from weatherconverter_tpu.models.srgan import Generator
    from weatherconverter_tpu.models.unet import Unet

    cfg = load_translation_config(args.config)
    attn = getattr(args, "attn", "bf16")
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    if attn == "int8":
        if not on_tpu:
            raise SystemExit(
                "--attn int8 exports the TPU Mosaic kernel and must be "
                "lowered on a TPU backend (this host is "
                f"{jax.devices()[0].platform}); use --attn bf16 for a "
                "portable export."
            )
        os.environ["WCTPU_ATTN_QK_INT8"] = "1"
    else:
        os.environ["WCTPU_ATTN_QK_INT8"] = "0"
    fused_export = attn == "int8"  # bf16 export = plain XLA ops, portable
    dcfg = cfg.diffusion
    size = dcfg.model.im_size
    sr_factor = cfg.srgan.upscale_factor
    hr = size * sr_factor
    num_classes = cfg.seg.model.num_classes
    B = args.batch
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)

    unet = Unet(config=dcfg.model, fused=fused_export)
    uparams = jax.eval_shape(
        lambda: unet.init(k1, jnp.zeros((1, size, size, 3)),
                          jnp.zeros((1,), jnp.int32))
    )["params"]
    sched = make_schedule(
        dcfg.diffusion.schedule, dcfg.diffusion.num_timesteps,
        dcfg.diffusion.beta_start, dcfg.diffusion.beta_end,
    )
    steps = args.steps or cfg.guidance.num_steps

    if args.program == "sample":
        def fn(up, k):
            return ddpm_sample(
                lambda x, t: unet.apply({"params": up}, x, t), sched, k,
                (B, size, size, 3), num_steps=steps,
            )

        abstract_args = (uparams, jax.ShapeDtypeStruct((2,), jnp.uint32))
    else:
        seg = make_seg_model(cfg.seg.model.name, num_classes,
                             cfg.seg.model.output_stride, train=False)
        seg_vars = jax.eval_shape(lambda: seg.init(k2, jnp.zeros((1, hr, hr, 3))))
        gen = Generator(
            in_channels=cfg.srgan.in_channels, num_channels=cfg.srgan.num_channels,
            num_blocks=cfg.srgan.num_blocks, upscale_factor=sr_factor,
        )
        gvars = jax.eval_shape(lambda: gen.init(k3, jnp.zeros((1, size, size, 3))))

        def fn(up, sv, gv, inp, gt, k):
            return sample_with_sgg(
                lambda x, t: unet.apply({"params": up}, x, t), sched,
                lambda x: seg.apply(sv, x), lambda x: gen.apply(gv, x),
                inp, gt, k, lam=cfg.guidance.lambda_, num_steps=steps,
                num_classes=num_classes, mode=cfg.guidance.mode,
                start_t=steps - 1,
            )

        abstract_args = (
            uparams, seg_vars, gvars,
            jax.ShapeDtypeStruct((B, size, size, 3), jnp.float32),
            jax.ShapeDtypeStruct((B, hr, hr), jnp.int32),
            jax.ShapeDtypeStruct((2,), jnp.uint32),
        )

    lowered = jax.jit(fn).lower(*abstract_args)
    text = lowered.as_text(dialect="stablehlo")
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        f.write(text)
    n_lines = text.count("\n")
    print(f"exported {args.program} ({steps} steps, batch {B}) as StableHLO: "
          f"{args.out} ({n_lines} lines)")
    return 0


def run_visualize(args) -> int:
    """Forward/backward strips (reference: visualizer.py:39-109)."""
    from weatherconverter_tpu.core.config import load_diffusion_config
    from weatherconverter_tpu.diffusion.sampling import ddpm_sample
    from weatherconverter_tpu.diffusion.schedule import make_schedule
    from weatherconverter_tpu.models.unet import Unet
    from weatherconverter_tpu.utils.images import (
        forward_process_strip,
        save_strip,
    )

    cfg = load_diffusion_config(args.config)
    sched = make_schedule(
        cfg.diffusion.schedule, cfg.diffusion.num_timesteps,
        cfg.diffusion.beta_start, cfg.diffusion.beta_end,
    )
    size = cfg.model.im_size
    x0 = jnp.asarray(_load_image(args.image, size)) * 2.0 - 1.0
    key = jax.random.PRNGKey(0)
    strip = forward_process_strip(sched, x0, key, every=args.every)
    save_strip(strip, os.path.join(args.out, "forward.png"))

    on_tpu = jax.devices()[0].platform == "tpu"
    model = Unet(config=cfg.model, fused=on_tpu)
    params = _load_unet_params(model, args.checkpoint, cfg, key)

    @jax.jit
    def run(p, k):
        fn = lambda x, t: model.apply({"params": p}, x, t)
        return ddpm_sample(
            fn, sched, k, (1, size, size, 3),
            return_trajectory_every=args.every,
        )

    _, traj = run(params, key)
    save_strip(traj[:, 0], os.path.join(args.out, "backward.png"))

    # photometric/geometric augmentation galleries
    # (reference: visualizer.py:160-191)
    from weatherconverter_tpu.utils.images import augmentation_galleries

    galleries = augmentation_galleries((x0 + 1.0) / 2.0, jax.random.PRNGKey(1))
    for name, strip in galleries.items():
        save_strip(strip, os.path.join(args.out, f"aug_{name}.png"), from_range="01")
    print(f"saved strips under {args.out}")
    return 0


def _discover_image_label_pairs(root: str) -> list:
    """Paired (image, labelIds) paths under `root`. Two layouts:
    (a) ACDC naming anywhere under the tree — `*_rgb_anon.*` with a sibling
        `*_gt_labelIds.*` (reference acdc.py pairing, incl. the layout
        data/datasets.SegPairedDataset walks);
    (b) flat `rgb/` + `gt/` subdirectories paired by matching basename stem;
        sorted-order zip is accepted only when every stem matches — a silent
        mispair corrupts the mIoU-consistency gate (ADVICE r2)."""
    import glob as _glob
    import os as _os

    pairs = []
    for img in sorted(_glob.glob(_os.path.join(root, "**", "*_rgb_anon.*"),
                                 recursive=True)):
        for cand in (
            img.replace("_rgb_anon", "_gt_labelIds"),
            img.replace("_rgb_anon", "_gt_labelIds").replace(
                f"{_os.sep}rgb_anon{_os.sep}", f"{_os.sep}gt{_os.sep}"
            ),
        ):
            if _os.path.exists(cand) and cand != img:
                pairs.append((img, cand))
                break
    if pairs:
        return pairs
    rgb_dir, gt_dir = _os.path.join(root, "rgb"), _os.path.join(root, "gt")
    if _os.path.isdir(rgb_dir) and _os.path.isdir(gt_dir):
        rgbs = sorted(
            p for p in _glob.glob(_os.path.join(rgb_dir, "*"))
            if p.lower().endswith((".png", ".jpg", ".jpeg"))
        )
        gts = sorted(
            p for p in _glob.glob(_os.path.join(gt_dir, "*"))
            if p.lower().endswith((".png", ".jpg", ".jpeg"))
        )
        if not rgbs:
            return []
        stem = lambda p: _os.path.splitext(_os.path.basename(p))[0]
        gt_by_stem = {stem(p): p for p in gts}
        by_stem = [(r, gt_by_stem[stem(r)]) for r in rgbs if stem(r) in gt_by_stem]
        if len(by_stem) == len(rgbs):
            return by_stem
        if by_stem and len(rgbs) != len(gts):
            # unequal dirs with a clean matched subset (e.g. extra labels):
            # use the subset, say so
            print(f"quality: pairing {len(by_stem)}/{len(rgbs)} images by "
                  "basename stem (unmatched files skipped)", file=sys.stderr)
            return by_stem
        if len(rgbs) == len(gts):
            raise SystemExit(
                f"--images: rgb/ and gt/ hold {len(rgbs)} files each but only "
                f"{len(by_stem)} basename stems match — refusing to pair by "
                "sorted order (a mispaired label silently corrupts the "
                "mIoU-consistency gate). Name labels after their images."
            )
    return []


def run_quality(args) -> int:
    """Quality gates for the translation pipeline: FID + mIoU-consistency
    (BASELINE.md north-star: throughput "at FID and mIoU-consistency
    parity"; the reference computes neither, SURVEY.md §6).

    Translates a batch of inputs, then reports:
      - mIoU of seg(original) vs gt and seg(translated) vs gt, and the gap
        (metrics/quality.consistency_gap)
      - FID between original and translated image sets (metrics/fid),
        with InceptionV3 pool3 features when --inception-checkpoint is
        given, else the frozen seg backbone's pooled features
        ("backbone-FID": valid for relative tracking, NOT comparable to
        published Inception-FID numbers)

    With --synthetic N the inputs are seeded random images/labels — the
    machinery end-to-end without a dataset; the report marks them as such.
    """
    import json

    from weatherconverter_tpu.core.config import load_translation_config
    from weatherconverter_tpu.diffusion.schedule import make_schedule
    from weatherconverter_tpu.guidance.translate import make_translate_fn
    from weatherconverter_tpu.metrics.fid import fid_from_batches
    from weatherconverter_tpu.metrics.quality import consistency_gap
    from weatherconverter_tpu.models.factory import make_seg_model
    from weatherconverter_tpu.models.srgan import Generator
    from weatherconverter_tpu.models.unet import Unet

    cfg = load_translation_config(args.config)
    on_tpu = jax.devices()[0].platform == "tpu"
    key = jax.random.PRNGKey(args.seed)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)

    dcfg = cfg.diffusion
    size = dcfg.model.im_size
    sr_factor = cfg.srgan.upscale_factor
    hr = size * sr_factor
    num_classes = cfg.seg.model.num_classes

    unet = Unet(config=dcfg.model, fused=on_tpu)
    uparams = _load_unet_params(unet, args.ddpm_checkpoint, dcfg, k1)
    seg = make_seg_model(
        cfg.seg.model.name, num_classes, cfg.seg.model.output_stride, train=False,
    )
    seg_vars = load_seg_variables(
        seg, args.seg_checkpoint, cfg.seg.model.name, (hr, hr), k2
    )
    gen = Generator(
        in_channels=cfg.srgan.in_channels, num_channels=cfg.srgan.num_channels,
        num_blocks=cfg.srgan.num_blocks, upscale_factor=sr_factor,
    )
    gvars = jax.jit(gen.init)(k3, jnp.zeros((1, size, size, 3)))
    sched = make_schedule(
        dcfg.diffusion.schedule, dcfg.diffusion.num_timesteps,
        dcfg.diffusion.beta_start, dcfg.diffusion.beta_end,
    )

    # ---- inputs ----
    synthetic = args.images is None
    if synthetic:
        n = args.synthetic
        inputs = jax.random.uniform(k4, (n, size, size, 3)) * 2.0 - 1.0
        gts = jax.random.randint(k5, (n, hr, hr), 0, num_classes)
    else:
        from PIL import Image

        from weatherconverter_tpu.data.labels import encode_target

        pairs = _discover_image_label_pairs(args.images)
        if not pairs:
            raise SystemExit(
                f"--images {args.images}: no pairs found. Expected either "
                "ACDC naming (*_rgb_anon.* with matching *_gt_labelIds.*) "
                "anywhere under the directory, or rgb/ + gt/ subdirectories "
                "with same-sorted filenames."
            )
        imgs, lbls = [], []
        for img_path, lbl_path in pairs:
            im = Image.open(img_path).convert("RGB").resize(
                (size, size), Image.BILINEAR
            )
            imgs.append(np.asarray(im, dtype=np.float32) / 255.0 * 2.0 - 1.0)
            lb = Image.open(lbl_path).resize((hr, hr), Image.NEAREST)
            lbls.append(encode_target(np.asarray(lb, dtype=np.uint8)))
        inputs = jnp.asarray(np.stack(imgs))
        gts = jnp.asarray(np.stack(lbls).astype(np.int32))
        print(f"quality: {len(pairs)} image/label pairs from {args.images}")

    translate = make_translate_fn(
        unet, uparams, sched, seg, seg_vars, gen, gvars,
        lam=args.lam, num_steps=args.steps, num_classes=num_classes,
        mode="fixed", guidance_style=args.guidance,
    )

    B = args.batch
    originals_hr, translated, gt_batches = [], [], []
    up2 = jax.jit(lambda x: jax.image.resize(
        (x + 1.0) / 2.0, (x.shape[0], hr, hr, 3), "bilinear"))
    for i in range(0, inputs.shape[0], B):
        xb = inputs[i:i + B]
        gb = gts[i:i + B]
        out = translate(xb, gb, jax.random.fold_in(key, i))
        translated.append(out)
        originals_hr.append(up2(xb))
        gt_batches.append(gb)

    seg_fn = lambda x: seg.apply(seg_vars, x)
    gap = consistency_gap(
        seg_fn,
        list(zip(originals_hr, gt_batches)),
        list(zip(translated, gt_batches)),
        num_classes,
    )

    # ---- FID features ----
    if args.inception_checkpoint:
        from weatherconverter_tpu.compat.torch_import import (
            convert_inception_v3,
            load_torch_checkpoint,
        )
        from weatherconverter_tpu.models.inception import InceptionV3, fid_input_resize

        inc = InceptionV3()
        ip, istats = convert_inception_v3(load_torch_checkpoint(args.inception_checkpoint))
        ivars = {"params": jax.tree.map(jnp.asarray, ip),
                 "batch_stats": jax.tree.map(jnp.asarray, istats)}
        feature_fn = lambda x: inc.apply(ivars, fid_input_resize(x))
        fid_kind = "inception_v3_pool3"
    else:
        feature_fn = lambda x: jnp.mean(
            seg.apply(seg_vars, x, method=lambda m, im: m.backbone(im))["out"],
            axis=(1, 2),
        ).astype(jnp.float32)
        fid_kind = "seg_backbone_pooled (relative tracking only)"

    fid = fid_from_batches(feature_fn, originals_hr, translated)

    report = {
        "data": f"synthetic (seeded random, n={inputs.shape[0]})" if synthetic else args.images,
        "weights": {
            "ddpm": args.ddpm_checkpoint or "random-init",
            "seg": args.seg_checkpoint or "random-init",
            "srgan": "random-init",
        },
        "guidance": args.guidance,
        "steps": args.steps,
        "fid_kind": fid_kind,
        "fid_original_vs_translated": round(float(fid), 4),
        "miou_original": round(gap["original_miou"], 4),
        "miou_translated": round(gap["translated_miou"], 4),
        "miou_consistency_gap": round(gap["miou_consistency_gap"], 4),
    }
    print(json.dumps(report, indent=2))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"saved {args.out}")
    return 0
