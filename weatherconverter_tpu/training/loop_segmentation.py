"""Segmentation training loop orchestration.

Functional equivalent of the reference seg trainer (reference:
seg_model/train.py:174-279 + __main__ 282-377): SGD param groups
(backbone at reduced lr), PolyLR per batch, CE/Focal loss, per-batch
input-gradient instrumentation, per-epoch validation with streaming
confusion-matrix mIoU and best-model checkpointing.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp

from weatherconverter_tpu.core.checkpoint import CheckpointManager, create_run
from weatherconverter_tpu.core.config import SegConfig
from weatherconverter_tpu.core.logging import MetricsLogger
from weatherconverter_tpu.core.rng import run_key, split_named
from weatherconverter_tpu.data.datasets import SegPairedDataset
from weatherconverter_tpu.data.loader import DataLoader
from weatherconverter_tpu.data.transforms import seg_eval_preprocess, seg_train_augment
from weatherconverter_tpu.metrics.stream import StreamSegMetrics, init_confusion
from weatherconverter_tpu.models.factory import make_seg_model
from weatherconverter_tpu.parallel.sharding import make_mesh, replicate, shard_batch
from weatherconverter_tpu.training.losses import make_seg_loss
from weatherconverter_tpu.training.optim import make_seg_optimizer
from weatherconverter_tpu.training.segmentation import (
    SegTrainState,
    create_seg_state,
    make_seg_eval_step,
)


def build_datasets(cfg: SegConfig):
    t = cfg.data.transform
    train_ds = SegPairedDataset(
        cfg.data.root_dir,
        split=cfg.data.train_split,
        weather=cfg.data.weather,
        images_dir=cfg.data.images,
        labels_dir=cfg.data.labels,
        resize_hw=tuple(t.resize_resolution),
    )
    val_ds = SegPairedDataset(
        cfg.data.root_dir,
        split=cfg.data.val_split,
        weather=cfg.data.weather,
        images_dir=cfg.data.images,
        labels_dir=cfg.data.labels,
        resize_hw=tuple(t.resize_resolution),
    )
    return train_ds, val_ds


def make_augmented_seg_train_step(cfg: SegConfig, loss_fn, mesh=None, input_grad=True):
    """Raw uint8 paired batch -> on-device ExtCompose-equivalent augment ->
    fwd/bwd -> SGD update, one jitted program (reference does augmentation in
    host workers: train.py:289-309). Delegates to the canonical
    training/segmentation.make_seg_train_step via its augment_fn hook (a
    hand-copied step body here is exactly how the diffusion loop's EMA
    update got dropped; review round 3)."""
    t = cfg.data.transform

    def augment(key, images_u8, labels):
        return seg_train_augment(
            key,
            images_u8,
            labels,
            crop=tuple(t.target_resolution),
            hflip_p=t.horizontal_flip,
            jitter=(t.jitter.brightness, t.jitter.contrast, t.jitter.saturation),
            noise_mean=t.random_noise.mean,
            noise_std_range=tuple(t.random_noise.std_range),
            masking_p=t.class_wise_masking.p,
            num_classes_to_keep=t.class_wise_masking.num_classes_to_keep,
            mean=tuple(t.mean),
            std=tuple(t.std),
            scale_range=tuple(t.scale_range) if t.scale_range else None,
            rotation_degrees=t.rotation_degrees,
            hue=t.hue,
        )

    from weatherconverter_tpu.training.segmentation import make_seg_train_step

    return make_seg_train_step(
        loss_fn, mesh=mesh, input_grad=input_grad, augment_fn=augment,
        fsdp=cfg.training.fsdp, accum_steps=cfg.training.accum_steps,
    )


def make_val_fns(cfg, model_eval, mesh=None):
    """Build the validation programs ONCE (jax.jit caches by callable
    identity: rebuilding them inside validate() re-compiled the full
    DeepLab eval graph every epoch; review round 3)."""
    t = cfg.data.transform
    eval_step = make_seg_eval_step(model_eval, cfg.model.num_classes, mesh=mesh)

    @jax.jit
    def prep(images_u8, labels):
        return seg_eval_preprocess(
            images_u8, labels, crop=tuple(t.target_resolution),
            mean=tuple(t.mean), std=tuple(t.std),
        )

    return eval_step, prep


def validate(cfg, model_eval, state, val_loader, mesh=None, val_fns=None) -> dict:
    """Streaming confusion-matrix validation (reference: train.py:263-279)."""
    nc = cfg.model.num_classes
    eval_step, prep = (
        val_fns if val_fns is not None else make_val_fns(cfg, model_eval, mesh=mesh)
    )

    conf = init_confusion(nc)
    if mesh is not None:
        conf = replicate(mesh, conf)
    dp_width = mesh.shape["data"] if mesh is not None else 1
    for images_u8, labels in val_loader:
        x, y = prep(jnp.asarray(images_u8), jnp.asarray(labels))
        if mesh is not None:
            rem = (-x.shape[0]) % dp_width
            if rem:
                # pad ragged final batches to the mesh width; padded rows
                # carry ignore_index labels so they add nothing to the
                # confusion matrix
                x = jnp.concatenate([x, jnp.repeat(x[-1:], rem, 0)], 0)
                y = jnp.concatenate(
                    [y, jnp.full((rem,) + y.shape[1:], 255, y.dtype)], 0
                )
            x, y = shard_batch(mesh, (x, y))
        conf = eval_step(state.params, state.batch_stats, conf, x, y)
    sm = StreamSegMetrics(nc)
    sm.update_confusion(jax.device_get(conf))
    return sm.get_results()


def train(cfg: SegConfig, max_steps: Optional[int] = None, datasets=None) -> SegTrainState:
    tr = cfg.training
    key = run_key(tr.random_seed)
    keys = split_named(key, "init", "train")

    from weatherconverter_tpu.parallel.sharding import plan_data_parallel

    train_ds, val_ds = datasets if datasets is not None else build_datasets(cfg)
    dp, global_batch = plan_data_parallel(
        tr.batch_size, scale_to_mesh=getattr(tr, "scale_batch_to_mesh", True)
    )
    if global_batch > len(train_ds):
        dp, global_batch = plan_data_parallel(tr.batch_size, scale_to_mesh=False)
    mesh = make_mesh(data=dp, devices=jax.devices()[:dp]) if dp > 1 else None
    if getattr(tr, "scale_lr_with_batch", False) and global_batch != tr.batch_size:
        factor = global_batch / tr.batch_size
        cfg = cfg.model_copy(deep=True)
        cfg.optimizer.params["lr"] = cfg.optimizer.params.get("lr", 1e-4) * factor
        cfg.optimizer.layerwise_lr = {
            k: v * factor for k, v in cfg.optimizer.layerwise_lr.items()
        }
        tr = cfg.training
    on_tpu = jax.devices()[0].platform == "tpu"
    dtype = jnp.bfloat16 if tr.dtype == "bfloat16" and on_tpu else jnp.float32
    model_train = make_seg_model(
        cfg.model.name, cfg.model.num_classes, cfg.model.output_stride,
        train=True, dtype=dtype, bn_momentum=cfg.model.bn_momentum,
    )
    model_eval = make_seg_model(
        cfg.model.name, cfg.model.num_classes, cfg.model.output_stride,
        train=False, dtype=dtype,
    )

    loader = DataLoader(train_ds, global_batch, shuffle=True, seed=tr.random_seed)
    val_loader = DataLoader(
        val_ds, global_batch, shuffle=False, seed=0, drop_last=False
    )
    max_iters = max(1, len(loader) * tr.epochs)

    hw = tuple(cfg.data.transform.target_resolution)
    variables = jax.jit(model_train.init)(
        keys["init"], jnp.zeros((1, hw[0], hw[1], 3))
    )
    if cfg.model.pretrained_backbone:
        from weatherconverter_tpu.compat.torch_import import (
            load_pretrained_backbone,
            load_torch_checkpoint,
            resolve_backbone_checkpoint,
        )

        # a .pth path, or 'imagenet'/'auto' to resolve the torch.hub-cached
        # checkpoint by name (the reference's pretrained=True story, offline)
        ckpt_path = resolve_backbone_checkpoint(
            cfg.model.pretrained_backbone, cfg.model.name
        )
        variables = load_pretrained_backbone(
            variables, load_torch_checkpoint(ckpt_path), cfg.model.name,
        )
        variables = jax.tree.map(jnp.asarray, variables)
    tx = make_seg_optimizer(
        variables["params"], cfg.optimizer, max_iters,
        sched_type=cfg.training.scheduler.type, sched_params=cfg.training.scheduler.params,
    )
    state = SegTrainState.create(
        apply_fn=model_train.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )

    loss_fn = make_seg_loss(tr.loss_function.type, tr.loss_function.params)
    step_fn = make_augmented_seg_train_step(cfg, loss_fn, mesh=mesh)
    val_fns = make_val_fns(cfg, model_eval, mesh=mesh)

    run_dir = create_run(cfg.folders.output)
    logger = MetricsLogger(run_dir, project="weather-converter-seg", config=cfg.model_dump())
    ckpt = CheckpointManager(
        f"{run_dir}/checkpoints", best_metric_name="Mean IoU", best_mode="max"
    )

    start_epoch = 0
    if tr.resume_training and tr.resume_checkpoint:
        # mirror of the diffusion loop's resume (reference seg train.py:361-365
        # restores model/optimizer/scheduler; here the whole TrainState —
        # params, batch_stats, opt state, step counter — restores in one shot)
        from weatherconverter_tpu.training.loop_diffusion import ckpt_restore_into

        state = ckpt_restore_into(tr.resume_checkpoint, state)
        start_epoch = int(state.step) // max(1, len(loader))
        logger.print(
            f"resumed from {tr.resume_checkpoint} at step {int(state.step)}"
            f" (epoch {start_epoch})"
        )

    if mesh is not None:
        from weatherconverter_tpu.parallel.fsdp import maybe_shard_state

        state = maybe_shard_state(mesh, state, fsdp=tr.fsdp)

    tkey = keys["train"]
    global_step = int(state.step) if hasattr(state, "step") else 0
    from weatherconverter_tpu.core.preempt import PreemptionGuard, preempt_save_index

    with PreemptionGuard() as guard:
        for epoch in range(start_epoch, tr.epochs):
            t0 = time.time()
            for images_u8, labels in loader:
                tkey, sub = jax.random.split(tkey)
                if mesh is not None:
                    images_u8, labels = shard_batch(mesh, (images_u8, labels))
                    sub_in = replicate(mesh, sub)
                else:
                    images_u8, labels = jnp.asarray(images_u8), jnp.asarray(labels)
                    sub_in = sub
                state, loss, ig = step_fn(state, images_u8, labels, sub_in)
                global_step += 1
                if global_step % tr.log_interval == 0:
                    logger.log(
                        {"train/loss": float(loss), "train/input_grad": float(ig), "epoch": epoch},
                        step=global_step,
                    )
                if guard.triggered:
                    # SIGTERM mid-epoch: flush post-step state, exit cleanly
                    # (core/preempt.py); resume restarts this epoch
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
            results = validate(cfg, model_eval, state, val_loader, mesh=mesh, val_fns=val_fns)
            logger.log(
                {
                    "val/mIoU": results["Mean IoU"],
                    "val/OverallAcc": results["Overall Acc"],
                    "epoch": epoch,
                    "epoch/sec": time.time() - t0,
                },
                step=global_step,
            )
            ckpt.save(epoch + 1, jax.device_get(state), metrics={"Mean IoU": results["Mean IoU"]})
    ckpt.wait()
    logger.finish()
    return state
