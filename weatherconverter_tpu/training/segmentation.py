"""Segmentation training: SGD param groups + PolyLR-per-step + BatchNorm
state threading + on-device validation metrics.

Capability parity with the reference seg trainer
(reference: seg_model/train.py:174-279):
  - SGD with the backbone param group at a reduced lr (train.py:333-344)
    via optax.multi_transform (training/optim.py:layerwise_sgd).
  - PolyLR stepped per BATCH (train.py:234) — the optax schedule consumes
    the per-step counter naturally.
  - CE(ignore=255) or Focal loss (train.py:356-359).
  - Input-gradient instrumentation: the reference sets
    `images.requires_grad = True` and reads `images.grad` magnitude every
    batch (train.py:203,211-212). Here that is `jax.grad` w.r.t. the image
    batch, computed in the same backward pass as the param grads
    (argnums=(0, 1)), behind the `input_grad` flag.
  - Validation accumulates the (C, C) confusion matrix ON DEVICE inside the
    jitted eval step; mIoU etc. derive on host once per epoch
    (metrics/stream.py; reference computes numpy per batch,
    stream_metrics.py:41-47).

BatchNorm: flax keeps running stats in a separate 'batch_stats' collection;
the train step threads it functionally (the torch reference mutates module
buffers in place). `set_bn_momentum` parity (reference:
seg_model/utils/utils.py:31-34) is a constructor-time momentum argument.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from weatherconverter_tpu.metrics.stream import confusion_update
from weatherconverter_tpu.training.losses import make_seg_loss


class SegTrainState(train_state.TrainState):
    """params + batch_stats + SGD/momentum state — functional analog of the
    reference checkpoint dict {model, optimizer, scheduler, epoch, loss}
    (reference: seg_model/train.py:94-100)."""

    batch_stats: Any = None
    epoch: int = 0


def create_seg_state(
    model_train,
    key: jax.Array,
    tx: optax.GradientTransformation,
    input_hw: tuple[int, int] = (256, 256),
) -> SegTrainState:
    dummy = jnp.zeros((1, input_hw[0], input_hw[1], 3), dtype=jnp.float32)
    variables = model_train.init(key, dummy)
    return SegTrainState.create(
        apply_fn=model_train.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )


def make_seg_train_step(
    loss_fn: Callable[[jax.Array, jax.Array], jax.Array],
    mesh: Optional[Mesh] = None,
    input_grad: bool = True,
    donate: bool = True,
    augment_fn=None,
    fsdp: bool = False,
    accum_steps: int = 1,
):
    """Compile the seg train step.

    Returns (state, images, labels) -> (state, loss, input_grad_mag) where
    `input_grad_mag` is the mean L2-over-channels magnitude of dL/d(images)
    (reference: train.py:211-212 logs `images.grad` magnitude per batch);
    zeros when input_grad=False.

    With `augment_fn(key, images_u8, labels) -> (images, labels)` the step
    signature becomes (state, images_u8, labels, key) and the paired
    augmentation compiles into the same program (ONE canonical step body —
    the loops previously hand-copied it, which invites drift)."""

    def core(state: SegTrainState, images: jax.Array, labels: jax.Array):
        def fwd_bwd(bs, imgs, lbls):
            """loss/grads/input-grad-magnitude/updated-BN-stats for one
            (micro)batch, from explicit batch_stats `bs`."""

            def lf(params, im):
                out, updates = state.apply_fn(
                    {"params": params, "batch_stats": bs}, im,
                    mutable=["batch_stats"],
                )
                return loss_fn(out, lbls), updates["batch_stats"]

            if input_grad:
                (loss, new_bs), (grads, igrads) = jax.value_and_grad(
                    lf, argnums=(0, 1), has_aux=True
                )(state.params, imgs)
                ig_mag = jnp.mean(
                    jnp.sqrt(jnp.sum(igrads.astype(jnp.float32) ** 2, axis=-1))
                )
            else:
                (loss, new_bs), grads = jax.value_and_grad(lf, has_aux=True)(
                    state.params, imgs
                )
                ig_mag = jnp.zeros((), dtype=jnp.float32)
            return loss, grads, ig_mag, new_bs

        if accum_steps <= 1:
            loss, grads, ig_mag, new_bs = fwd_bwd(state.batch_stats, images, labels)
        else:
            # Gradient accumulation with torch semantics: the MEAN gradient
            # over microbatches drives ONE optimizer update; BN running
            # stats chain through the microbatch forwards in order.
            b = images.shape[0]
            assert b % accum_steps == 0, (b, accum_steps)
            mb = b // accum_steps
            micro_i = images.reshape((accum_steps, mb) + images.shape[1:])
            micro_l = labels.reshape((accum_steps, mb) + labels.shape[1:])

            def one(carry, ml):
                loss_a, grads_a, ig_a, bs = carry
                l, g, ig, bs2 = fwd_bwd(bs, ml[0], ml[1])
                return (loss_a + l,
                        jax.tree_util.tree_map(jnp.add, grads_a, g),
                        ig_a + ig, bs2), None

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (loss, grads, ig_mag, new_bs), _ = jax.lax.scan(
                one,
                (jnp.zeros((), jnp.float32), zeros,
                 jnp.zeros((), jnp.float32), state.batch_stats),
                (micro_i, micro_l),
            )
            inv = 1.0 / accum_steps
            loss, ig_mag = loss * inv, ig_mag * inv
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_bs)
        return state, loss, ig_mag

    if augment_fn is None:
        step = core
    else:

        def step(state, images_u8, labels, key):
            images, labels2 = augment_fn(key, images_u8, labels)
            return core(state, images, labels2)

    kwargs: dict[str, Any] = {}
    if donate:
        kwargs["donate_argnums"] = (0,)
    if mesh is not None:
        rep = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        # fsdp: the state keeps its committed per-leaf ZeRO-3 shardings
        # (parallel.fsdp.shard_state_fsdp); XLA all-gathers params at use
        # and reduce-scatters grads. Same step body either way.
        st = None if fsdp else rep
        ins = (st, data, data) if augment_fn is None else (st, data, data, rep)
        kwargs["in_shardings"] = ins
        kwargs["out_shardings"] = (st, rep, rep)
    return jax.jit(step, **kwargs)


def make_seg_eval_step(
    model_eval, num_classes: int, mesh: Optional[Mesh] = None
):
    """Jitted eval step: forward in inference mode (running BN stats),
    argmax, on-device confusion update (reference: train.py:263-279 +
    stream_metrics `update`)."""

    def step(params, batch_stats, conf, images, labels):
        out = model_eval.apply(
            {"params": params, "batch_stats": batch_stats}, images
        )
        pred = jnp.argmax(out, axis=-1).astype(jnp.int32)
        conf = confusion_update(conf, pred, labels, num_classes)
        return conf

    kwargs: dict[str, Any] = {}
    if mesh is not None:
        rep = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        kwargs["in_shardings"] = (rep, rep, rep, data, data)
        kwargs["out_shardings"] = rep
    return jax.jit(step, **kwargs)


def make_seg_infer_step(model_eval, mesh: Optional[Mesh] = None):
    """Jitted inference: logits + argmax prediction (reference:
    seg_model/inference.py:118-134 without the gradient probe; see
    guidance.seg_gradients for the probe)."""

    def step(params, batch_stats, images):
        out = model_eval.apply({"params": params, "batch_stats": batch_stats}, images)
        return out, jnp.argmax(out, axis=-1).astype(jnp.int32)

    return jax.jit(step)
