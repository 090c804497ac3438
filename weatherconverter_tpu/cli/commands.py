"""CLI subcommand implementations (sample / translate / infer-seg /
visualize). Each mirrors one reference entry point; see cli/main.py for the
mapping table."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


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
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer().restore(checkpoint, init())


def run_sample(args) -> int:
    from weatherconverter_tpu.core.config import load_diffusion_config
    from weatherconverter_tpu.diffusion.sampling import (
        ddim_sample,
        ddpm_sample,
        ddpm_sample_legacy,
    )
    from weatherconverter_tpu.diffusion.schedule import make_schedule
    from weatherconverter_tpu.models.unet import Unet
    from weatherconverter_tpu.models.unet_legacy import LegacyUNet
    from weatherconverter_tpu.utils.images import save_images

    cfg = load_diffusion_config(args.config)
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
            convert_deeplab_resnet,
            load_torch_checkpoint,
        )

        backbone = model_name.split("_")[-1]
        params, stats = convert_deeplab_resnet(
            load_torch_checkpoint(checkpoint), backbone
        )
        return {"params": params, "batch_stats": stats}
    variables = jax.jit(model.init)(key, jnp.zeros((1, hw[0], hw[1], 3)))
    if checkpoint and checkpoint.endswith(".npz"):
        from weatherconverter_tpu.core.checkpoint import load_pytree_npz

        return load_pytree_npz(checkpoint, variables)
    if checkpoint:
        import orbax.checkpoint as ocp

        return ocp.StandardCheckpointer().restore(checkpoint, variables)
    return variables


def _load_image(path, size):
    from PIL import Image

    img = Image.open(path).convert("RGB").resize((size, size), Image.BILINEAR)
    return np.asarray(img, dtype=np.float32) / 255.0


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

    translate = make_translate_fn(
        unet, uparams, sched, seg, seg_vars, gen,
        gvars["params"] if "params" in gvars else gvars,
        lam=args.lam, num_steps=args.steps, mode=args.mode,
        num_classes=cfg.seg.model.num_classes,
    )
    out = translate(jnp.asarray(img)[None], jnp.asarray(gt)[None], k4)
    save_images(out, args.out, nrow=1, from_range="unit")
    print(f"saved {args.out}")
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
        gt = jnp.asarray(encode_target(np.asarray(lbl, np.uint8)))[None]
        seg_fn = lambda im: model.apply(variables, im)
        grads = seg_input_gradients(seg_fn, xn, gt)
        mag = gradient_magnitude(grads)
        m = np.asarray(mag[0, ..., 0])
        m = (m - m.min()) / max(m.max() - m.min(), 1e-12)
        Image.fromarray((m * 255).astype(np.uint8)).save(
            os.path.join(args.out, "gradient_magnitude.png")
        )
    print(f"saved outputs under {args.out}")
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
    print(f"saved strips under {args.out}")
    return 0
