"""Swift-SRGAN training: generator pretraining (pixel loss) + adversarial
fine-tuning with the Discriminator.

The reference DEFINES the Discriminator (reference: srgan_model/
models.py:95-138) but ships no SRGAN training code at all — only inference
(srgan_model/inference.py). This module supplies the missing capability the
TPU way: both phases are single jitted steps over a DP mesh, following the
Swift-SRGAN recipe (L1/MSE pixel loss pretrain, then BCE adversarial +
pixel content loss).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from weatherconverter_tpu.training.losses import bce_logits


class SRGANState(train_state.TrainState):
    batch_stats: Any = None
    # completed-epoch counter for phase-correct resume (mirrors
    # DDPMTrainState.epoch; the pretrain->gan phase schedule derives from it)
    epoch: int = 0


def create_srgan_states(
    gen, disc, key: jax.Array, lr_size: int = 32, upscale: int = 4,
    g_lr: float = 1e-4, d_lr: float = 1e-4,
):
    kg, kd = jax.random.split(key)
    gv = gen.init(kg, jnp.zeros((1, lr_size, lr_size, 3)))
    dv = disc.init(kd, jnp.zeros((1, lr_size * upscale, lr_size * upscale, 3)))
    gs = SRGANState.create(
        apply_fn=gen.apply, params=gv["params"],
        batch_stats=gv.get("batch_stats", {}), tx=optax.adam(g_lr),
    )
    ds = SRGANState.create(
        apply_fn=disc.apply, params=dv["params"],
        batch_stats=dv.get("batch_stats", {}), tx=optax.adam(d_lr),
    )
    return gs, ds


def make_pretrain_step(pixel_loss: str = "l1", mesh: Optional[Mesh] = None):
    """Phase 1: supervised G training on (LR, HR) pairs."""

    def step(gs: SRGANState, lr_img: jax.Array, hr_img: jax.Array):
        def lf(params):
            sr, upd = gs.apply_fn(
                {"params": params, "batch_stats": gs.batch_stats},
                lr_img, mutable=["batch_stats"],
            )
            sr = sr.astype(jnp.float32)
            if pixel_loss == "l1":
                loss = jnp.mean(jnp.abs(sr - hr_img))
            else:
                loss = jnp.mean((sr - hr_img) ** 2)
            return loss, upd["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(lf, has_aux=True)(gs.params)
        gs = gs.apply_gradients(grads=grads).replace(batch_stats=new_bs)
        return gs, loss

    kwargs: dict = {"donate_argnums": (0,)}
    if mesh is not None:
        rep = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        kwargs["in_shardings"] = (rep, data, data)
        kwargs["out_shardings"] = (rep, rep)
    return jax.jit(step, **kwargs)


def make_gan_step(
    adv_weight: float = 1e-3,
    pixel_weight: float = 1.0,
    mesh: Optional[Mesh] = None,
    pixel_loss: str = "l1",
):
    """Phase 2: alternating D / G update in one jitted step.

    D: BCE(D(hr), 1) + BCE(D(G(lr)), 0);  G: pixel + adv_weight * BCE(D(G(lr)), 1).
    The reference Discriminator ends in sigmoid (models.py:137), so plain BCE.
    `pixel_loss` ('l1'|'l2') matches the pretrain phase's content objective
    (it was silently hardcoded to L1 before; review round 3).
    """

    def step(gs: SRGANState, ds: SRGANState, lr_img, hr_img):
        # --- D update (G frozen) ---
        sr, g_upd = gs.apply_fn(
            {"params": gs.params, "batch_stats": gs.batch_stats},
            lr_img, mutable=["batch_stats"],
        )
        sr = jax.lax.stop_gradient(sr)

        def d_loss_fn(dparams):
            d_real, upd = ds.apply_fn(
                {"params": dparams, "batch_stats": ds.batch_stats},
                hr_img, mutable=["batch_stats"],
            )
            d_fake, upd2 = ds.apply_fn(
                {"params": dparams, "batch_stats": upd["batch_stats"]},
                sr, mutable=["batch_stats"],
            )
            loss = bce_logits(d_real, jnp.ones_like(d_real)) + bce_logits(
                d_fake, jnp.zeros_like(d_fake)
            )
            return loss, upd2["batch_stats"]

        (d_loss, d_bs), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(ds.params)
        ds = ds.apply_gradients(grads=d_grads).replace(batch_stats=d_bs)

        # --- G update (D frozen) ---
        def g_loss_fn(gparams):
            sr2, upd = gs.apply_fn(
                {"params": gparams, "batch_stats": gs.batch_stats},
                lr_img, mutable=["batch_stats"],
            )
            sr2 = sr2.astype(jnp.float32)
            d_out, _ = ds.apply_fn(
                {"params": ds.params, "batch_stats": ds.batch_stats},
                sr2,
                mutable=["batch_stats"],  # train-mode BN; stats update discarded
            )
            if pixel_loss == "l1":
                pixel = jnp.mean(jnp.abs(sr2 - hr_img))
            else:
                pixel = jnp.mean((sr2 - hr_img) ** 2)
            adv = bce_logits(d_out, jnp.ones_like(d_out))
            return pixel_weight * pixel + adv_weight * adv, upd["batch_stats"]

        (g_loss, g_bs), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(gs.params)
        gs = gs.apply_gradients(grads=g_grads).replace(batch_stats=g_bs)
        return gs, ds, g_loss, d_loss

    kwargs: dict = {"donate_argnums": (0, 1)}
    if mesh is not None:
        rep = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        kwargs["in_shardings"] = (rep, rep, data, data)
        kwargs["out_shardings"] = (rep, rep, rep, rep)
    return jax.jit(step, **kwargs)
