"""Swift-SRGAN training loop orchestration.

The reference ships the Generator AND Discriminator (reference:
srgan_model/models.py:65-138) but no training code at all — only inference
(srgan_model/inference.py). This loop supplies the capability end-to-end,
mirroring the house style of loop_diffusion.py: raw uint8 HR batches from
the prefetching loader; random crop / flip / LR synthesis (box-filter
downsample by the upscale factor) INSIDE the jitted DP step; two phases
(pixel-loss pretrain then adversarial, per the Swift-SRGAN recipe); Orbax
checkpoints, JSONL/wandb metrics, resume.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp

from weatherconverter_tpu.core.checkpoint import CheckpointManager, create_run
from weatherconverter_tpu.core.config import SRGANTrainConfig
from weatherconverter_tpu.core.logging import MetricsLogger
from weatherconverter_tpu.core.rng import run_key, split_named
from weatherconverter_tpu.data.datasets import DiffusionImageDataset
from weatherconverter_tpu.data.loader import DataLoader
from weatherconverter_tpu.data.transforms import random_crop, random_hflip, to_float
from weatherconverter_tpu.models.srgan import Discriminator, Generator
from weatherconverter_tpu.ops.image import avg_pool
from weatherconverter_tpu.parallel.sharding import (
    make_mesh,
    plan_data_parallel,
    replicate,
    shard_batch,
)
from weatherconverter_tpu.training.srgan import (
    create_srgan_states,
    make_gan_step,
    make_pretrain_step,
)


def build_dataset(cfg: SRGANTrainConfig) -> DiffusionImageDataset:
    """HR image pool: the same merged weather-image tree the diffusion model
    trains on (reference data layout, dataloader.py:20-34)."""
    import os

    ds = DiffusionImageDataset(
        os.path.join(cfg.data.root_dir, cfg.data.acdc_images),
        selected_conditions=cfg.data.weather,
        resize_to=cfg.training.hr_crop,
    )
    for extra in (cfg.data.bdd_dir, cfg.data.dawn_dir):
        path = os.path.join(cfg.data.root_dir, extra)
        if extra and os.path.isdir(path):
            ds.add_images(path)
    return ds


def make_pair_fn(hr_crop: int, upscale: int):
    """uint8 HR batch -> (lr, hr) float pair, all on device inside the step:
    random crop + hflip; HR in [0,1] (the Generator's output range,
    models.py:91 `(tanh+1)/2`); LR = box-filter downsample by the upscale
    factor (the standard bicubic-free SR degradation; one avg_pool)."""

    def pairs(key: jax.Array, images_u8: jax.Array):
        kc, kf = jax.random.split(key)
        hr = to_float(images_u8)  # [0, 1]
        hr = random_crop(kc, hr, (hr_crop, hr_crop))
        hr = random_hflip(kf, hr, 0.5)
        lr = avg_pool(hr, upscale, upscale)
        return lr, hr

    return pairs


def train(
    cfg: SRGANTrainConfig,
    max_steps: Optional[int] = None,
    dataset=None,
):
    """Returns (gen_state, disc_state). `max_steps` truncates for smoke runs
    (counts steps across both phases)."""
    tr = cfg.training
    key = run_key(tr.random_seed)
    keys = split_named(key, "init", "train")

    ds = dataset if dataset is not None else build_dataset(cfg)
    dp, global_batch = plan_data_parallel(
        tr.batch_size, scale_to_mesh=getattr(tr, "scale_batch_to_mesh", True)
    )
    if global_batch > len(ds):
        dp, global_batch = plan_data_parallel(tr.batch_size, scale_to_mesh=False)
    mesh = make_mesh(data=dp, devices=jax.devices()[:dp]) if dp > 1 else None

    on_tpu = jax.devices()[0].platform == "tpu"
    dtype = jnp.bfloat16 if tr.dtype == "bfloat16" and on_tpu else jnp.float32
    upscale = cfg.srgan.upscale_factor
    lr_size = tr.hr_crop // upscale
    gen = Generator(
        in_channels=cfg.srgan.in_channels,
        num_channels=cfg.srgan.num_channels,
        num_blocks=cfg.srgan.num_blocks,
        upscale_factor=upscale,
        train=True,
        dtype=dtype,
    )
    disc = Discriminator(in_channels=cfg.srgan.in_channels, train=True, dtype=dtype)
    gs, dstate = create_srgan_states(
        gen, disc, keys["init"], lr_size=lr_size, upscale=upscale,
        g_lr=tr.g_lr, d_lr=tr.d_lr,
    )

    run_dir = create_run(cfg.folders.output)
    logger = MetricsLogger(run_dir, project="weather-converter-srgan", config=cfg.model_dump())
    ckpt = CheckpointManager(f"{run_dir}/checkpoints")
    if tr.resume_training and tr.resume_checkpoint:
        from weatherconverter_tpu.core.checkpoint import restore_auto

        gs, dstate = restore_auto(tr.resume_checkpoint, (gs, dstate), prefer_best=False)
        logger.print(f"resumed from {tr.resume_checkpoint} at step {int(gs.step)}")

    pair_fn = make_pair_fn(tr.hr_crop, upscale)
    pre_step = make_pretrain_step(pixel_loss=tr.pixel_loss, mesh=mesh)
    gan_step = make_gan_step(
        adv_weight=tr.adv_weight, mesh=mesh, pixel_loss=tr.pixel_loss
    )
    # the (lr, hr) synthesis is tiny elementwise work; jit it standalone so
    # both phases share one compiled augment program
    pair_jit = jax.jit(pair_fn)

    loader = DataLoader(
        ds, global_batch, shuffle=True, seed=tr.random_seed,
        num_workers=max(1, tr.num_workers) if tr.num_workers else 8,
    )
    if global_batch != tr.batch_size:
        logger.print(f"DP x{dp}: global batch {global_batch} ({tr.batch_size}/device)")
    if mesh is not None:
        gs = replicate(mesh, gs)
        dstate = replicate(mesh, dstate)

    tkey = keys["train"]
    global_step = int(jax.device_get(gs.step))
    for epoch in range(int(jax.device_get(gs.epoch)), tr.epochs):
        phase = "pretrain" if epoch < tr.pretrain_epochs else "gan"
        # exact epoch means without per-batch host syncs: accumulate lazily
        # on device, one readback per epoch
        ep_g, ep_d, nb, t0 = None, None, 0, time.time()
        for batch in loader:
            tkey, sub = jax.random.split(tkey)
            b = shard_batch(mesh, batch) if mesh is not None else jnp.asarray(batch)
            lr_img, hr_img = pair_jit(sub, b)
            if phase == "pretrain":
                gs, g_loss = pre_step(gs, lr_img, hr_img)
                d_loss = None
            else:
                gs, dstate, g_loss, d_loss = gan_step(gs, dstate, lr_img, hr_img)
                ep_d = d_loss if ep_d is None else ep_d + d_loss
            ep_g = g_loss if ep_g is None else ep_g + g_loss
            global_step += 1
            nb += 1
            if global_step % tr.log_interval == 0:
                rec = {"train/g_loss": float(g_loss), "epoch": epoch, "phase": phase}
                if d_loss is not None:
                    rec["train/d_loss"] = float(d_loss)
                logger.log(rec, step=global_step)
            if max_steps is not None and global_step >= max_steps:
                logger.finish()
                return gs, dstate
        dt = time.time() - t0
        logger.log(
            {
                "epoch": epoch,
                "phase": phase,
                "epoch/g_loss": float(ep_g) / nb if nb else 0.0,
                "epoch/d_loss": float(ep_d) / nb if ep_d is not None and nb else 0.0,
                "epoch/img_per_sec": nb * global_batch / max(dt, 1e-9),
            },
            step=global_step,
        )
        gs = gs.replace(epoch=epoch + 1)
        if (epoch + 1) % tr.save_interval == 0:
            ckpt.save(epoch + 1, jax.device_get((gs, dstate)))
    ckpt.wait()
    logger.finish()
    return gs, dstate
