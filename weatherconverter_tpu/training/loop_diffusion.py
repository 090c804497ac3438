"""DDPM training loop orchestration.

The functional equivalent of the reference's `train` (reference:
diffusion_model/train_ddpm.py:71-144): epochs over the merged
ACDC+BDD+DAWN image set, eps-MSE steps, interval logging, periodic
checkpointing, resume. TPU-first differences: the loader ships uint8 crops
source-resized on host; random crop/flip and [-1,1] scaling happen INSIDE
the jitted DP train step (one fused program per step); checkpoints are Orbax
(core/checkpoint.py) instead of torch.save dicts.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from weatherconverter_tpu.core.checkpoint import CheckpointManager, create_run
from weatherconverter_tpu.core.config import DiffusionConfig
from weatherconverter_tpu.core.logging import MetricsLogger
from weatherconverter_tpu.core.rng import run_key, split_named
from weatherconverter_tpu.data.datasets import DiffusionImageDataset
from weatherconverter_tpu.data.loader import DataLoader
from weatherconverter_tpu.data.transforms import diffusion_train_augment
from weatherconverter_tpu.diffusion.schedule import make_schedule
from weatherconverter_tpu.models.unet import Unet
from weatherconverter_tpu.parallel.sharding import (
    make_mesh,
    replicate,
    shard_batch,
)
from weatherconverter_tpu.training.diffusion import (
    DDPMTrainState,
    create_ddpm_state,
)
from weatherconverter_tpu.training.losses import mse_loss


def build_dataset(cfg: DiffusionConfig) -> DiffusionImageDataset:
    """ACDC + optional BDD/DAWN merge (reference: train_ddpm.py:171-179)."""
    import os

    size = cfg.model.im_size
    ds = DiffusionImageDataset(
        os.path.join(cfg.data.root_dir, cfg.data.acdc_images),
        selected_conditions=cfg.data.weather,
        resize_to=size,
    )
    for extra in (cfg.data.bdd_dir, cfg.data.dawn_dir):
        path = os.path.join(cfg.data.root_dir, extra)
        if extra and os.path.isdir(path):
            ds.add_images(path)
    return ds


def make_augmented_train_step(sched, crop: int, mesh=None, donate=True, fsdp=False,
                              accum_steps=1):
    """Train step whose input is the RAW uint8 host batch: augmentation
    (crop/flip/scale) + q-sample + eps-MSE + Adam update (+ EMA shadow)
    compile into ONE program (the reference does augmentation on host
    workers, train_ddpm.py:150-159). Delegates to the canonical
    training/diffusion.make_train_step via its augment_fn hook — an earlier
    hand-copied body here silently dropped the EMA update (review round 3)."""
    from weatherconverter_tpu.training.diffusion import make_train_step

    return make_train_step(
        sched, mesh=mesh, donate=donate, fsdp=fsdp, accum_steps=accum_steps,
        augment_fn=partial(diffusion_train_augment, crop=crop),
    )


def train(
    cfg: DiffusionConfig,
    max_steps: Optional[int] = None,
    dataset=None,
) -> DDPMTrainState:
    """Full training run; returns the final state. `max_steps` truncates for
    smoke tests."""
    tr = cfg.training
    key = run_key(tr.random_seed)
    keys = split_named(key, "init", "train")

    from weatherconverter_tpu.parallel.sharding import plan_data_parallel

    ds = dataset if dataset is not None else build_dataset(cfg)
    if len(ds) == 0:
        # without this, a missing dataset "trains" vacuously: every epoch has
        # zero batches yet checkpoints still save on the epoch cadence
        raise FileNotFoundError(
            "diffusion dataset is empty: no images under "
            f"{os.path.join(cfg.data.root_dir, cfg.data.acdc_images)!r} for "
            f"conditions {list(cfg.data.weather)!r} (expected the reference's "
            "ACDC layout, dataloader.py:20-27: "
            "<root>/rgb_anon/<condition>/<split>/**.png)"
        )
    dp, global_batch = plan_data_parallel(
        tr.batch_size, scale_to_mesh=getattr(tr, "scale_batch_to_mesh", True)
    )
    if global_batch > len(ds):
        # tiny dataset (smoke runs): fall back to batch-as-global
        dp, global_batch = plan_data_parallel(tr.batch_size, scale_to_mesh=False)
    mesh = make_mesh(data=dp, devices=jax.devices()[:dp]) if dp > 1 else None
    lr = tr.lr * (global_batch / tr.batch_size) if getattr(tr, "scale_lr_with_batch", False) else tr.lr
    sched = make_schedule(
        cfg.diffusion.schedule,
        cfg.diffusion.num_timesteps,
        cfg.diffusion.beta_start,
        cfg.diffusion.beta_end,
    )
    on_tpu = jax.devices()[0].platform == "tpu"
    model = Unet(
        config=cfg.model,
        fused=on_tpu,
        dtype=jnp.bfloat16 if tr.dtype == "bfloat16" and on_tpu else jnp.float32,
    )
    state = create_ddpm_state(
        model, keys["init"], im_size=cfg.model.im_size, lr=lr,
        ema_decay=getattr(tr, "ema_decay", 0.0),
    )

    run_dir = create_run(cfg.folders.output)
    logger = MetricsLogger(run_dir, project="weather-converter-diffusion", config=cfg.model_dump())
    ckpt = CheckpointManager(f"{run_dir}/checkpoints")

    if tr.resume_training and tr.resume_checkpoint:
        state = ckpt_restore_into(tr.resume_checkpoint, state)
        logger.print(f"resumed from {tr.resume_checkpoint} at epoch {int(state.epoch)}")

    loader = DataLoader(
        ds, global_batch, shuffle=True, seed=tr.random_seed,
        num_workers=max(1, tr.num_workers) if tr.num_workers else 8,
    )
    if global_batch != tr.batch_size:
        logger.print(
            f"DP x{dp}: global batch {global_batch} ({tr.batch_size}/device), lr={lr}"
        )
    step_fn = make_augmented_train_step(
        sched, cfg.model.im_size, mesh=mesh, donate=tr.donate_state,
        fsdp=tr.fsdp, accum_steps=tr.accum_steps,
    )

    if mesh is not None:
        from weatherconverter_tpu.parallel.fsdp import maybe_shard_state

        state = maybe_shard_state(mesh, state, fsdp=tr.fsdp)
        if tr.fsdp:
            from weatherconverter_tpu.parallel.fsdp import sharded_fraction

            logger.print(f"FSDP: {sharded_fraction(state):.1%} of state bytes "
                         f"sharded across {dp} devices")

    tkey = keys["train"]
    # continue step numbering across resume (metrics alignment; the seg loop
    # already did this)
    global_step = int(jax.device_get(state.step))
    from weatherconverter_tpu.core.preempt import PreemptionGuard, preempt_save_index

    with PreemptionGuard() as guard:
        for epoch in range(int(state.epoch), tr.epochs):
            # exact epoch mean WITHOUT per-batch host syncs: accumulate on
            # device (losses share one sharding), read back once per epoch
            epoch_loss_dev, nb, t0 = None, 0, time.time()
            for batch in loader:
                tkey, sub = jax.random.split(tkey)
                b = shard_batch(mesh, batch) if mesh is not None else jnp.asarray(batch)
                skey = replicate(mesh, sub) if mesh is not None else sub
                state, loss = step_fn(state, b, skey)
                epoch_loss_dev = loss if epoch_loss_dev is None else epoch_loss_dev + loss
                global_step += 1
                nb += 1
                if global_step % tr.log_interval == 0:
                    lv = float(loss)  # device sync only at log interval
                    logger.log({"train/loss": lv, "epoch": epoch}, step=global_step)
                if guard.triggered:
                    # SIGTERM mid-epoch: flush the post-step state through the
                    # normal checkpoint path and exit cleanly; state.epoch is
                    # still `epoch`, so resume restarts this epoch
                    idx = preempt_save_index(ckpt, global_step)
                    ckpt.save(idx, jax.device_get(state))
                    ckpt.wait()
                    logger.print(
                        f"preempted (signal {guard.received}): checkpoint "
                        f"flushed at step {global_step} (epoch {epoch}), exiting"
                    )
                    logger.finish()
                    return state
                if max_steps is not None and global_step >= max_steps:
                    logger.finish()
                    return state
            dt = time.time() - t0
            logger.log(
                {
                    "epoch": epoch,
                    "epoch/loss": float(epoch_loss_dev) / nb if nb else 0.0,
                    "epoch/sec": dt,
                    "epoch/img_per_sec": nb * global_batch / max(dt, 1e-9),
                },
                step=global_step,
            )
            state = state.replace(epoch=epoch + 1)
            if (epoch + 1) % tr.save_interval == 0:
                ckpt.save(epoch + 1, jax.device_get(state))
    ckpt.wait()
    logger.finish()
    return state


def ckpt_restore_into(path: str, state):
    """Restore any framework checkpoint artifact into `state`: .npz fallback,
    a CheckpointManager run dir (latest step), or one Orbax step dir."""
    from weatherconverter_tpu.core.checkpoint import restore_auto

    return restore_auto(path, state, prefer_best=False)
