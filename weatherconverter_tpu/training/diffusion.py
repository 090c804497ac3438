"""DDPM training: functional train state + jitted data-parallel train step.

Capability parity with the reference training loop
(reference: diffusion_model/train_ddpm.py:71-144): per step draw
t ~ U[0, T), noise ~ N(0, I), q-sample, predict eps with the UNet, MSE loss,
Adam update. TPU-first differences:

  - The whole step (sampling t/noise INCLUDED — the reference does these on
    host, train_ddpm.py:99-102) is one jitted function; RNG is a threaded
    jax.random key.
  - Data parallelism: batch arrays arrive sharded over the ('data',) mesh
    axis, params/opt-state replicated; XLA inserts the gradient all-reduce
    over ICI (SURVEY.md §2.4 — absent in the reference, first-class here).
  - bf16 compute / f32 params + f32 loss accumulation; the train state is
    donated so params are updated in place in HBM.
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from weatherconverter_tpu.diffusion.schedule import NoiseSchedule, q_sample
from weatherconverter_tpu.ops import attention
from weatherconverter_tpu.training.losses import mse_loss
from weatherconverter_tpu.training import optim as optim_lib


class DDPMTrainState(train_state.TrainState):
    """params + Adam state + step counter — the functional analog of the
    reference's {model_state_dict, optimizer_state_dict, epoch} checkpoint
    dict (reference: train_ddpm.py:56-60) — plus an optional EMA shadow of
    the params, updated inside the jitted step and consumed by samplers."""

    epoch: int = 0
    ema: Optional["EMA"] = None


def create_ddpm_state(
    model,
    key: jax.Array,
    im_size: int,
    im_channels: int = 3,
    lr: float = 1e-4,
    tx: Optional[optax.GradientTransformation] = None,
    ema_decay: float = 0.0,
) -> DDPMTrainState:
    """Initialize UNet params (NHWC dummy batch) and Adam(lr) as in the
    reference (train_ddpm.py:187-190). `ema_decay > 0` attaches an EMA
    shadow (framework extension — standard DDPM practice the reference
    lacks)."""
    dummy_x = jnp.zeros((1, im_size, im_size, im_channels), dtype=jnp.float32)
    dummy_t = jnp.zeros((1,), dtype=jnp.int32)
    variables = model.init(key, dummy_x, dummy_t)
    tx = tx if tx is not None else optim_lib.adam(lr)
    ema = EMA.create(variables["params"], decay=ema_decay) if ema_decay > 0 else None
    return DDPMTrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx, ema=ema
    )


def ddpm_loss_fn(
    params, apply_fn, sched: NoiseSchedule, images: jax.Array, key: jax.Array
):
    """Draw (t, noise), q-sample, eps-MSE (reference: train_ddpm.py:99-108)."""
    tkey, nkey = jax.random.split(key)
    b = images.shape[0]
    t = jax.random.randint(tkey, (b,), 0, sched.T)
    noise = jax.random.normal(nkey, images.shape, dtype=images.dtype)
    xt = q_sample(sched, images, noise, t)
    eps_hat = apply_fn({"params": params}, xt, t)
    return mse_loss(eps_hat, noise)


def train_step(
    state: DDPMTrainState,
    images: jax.Array,
    key: jax.Array,
    sched: NoiseSchedule,
    augment_fn=None,
    accum_steps: int = 1,
):
    """One un-jitted DDPM step; see `make_train_step` for the compiled,
    mesh-sharded version. `augment_fn(key, images) -> images` runs on-device
    augmentation inside the same program (the loops pass the crop/flip
    chain; keeping ONE canonical step body means EMA/optimizer changes can't
    silently diverge between the plain and augmented paths — a drift a
    review actually caught).

    `accum_steps > 1` splits the batch into that many microbatches and
    accumulates the MEAN gradient via lax.scan before the single optimizer
    update — the same unbiased estimator at the same effective batch size
    (each microbatch draws its own (t, noise) from a split key, so the
    realization differs from the one-shot step) at 1/accum the activation
    memory. ONE optimizer/EMA update either way; tests pin the exact
    mean-of-microbatch-grads semantics against a hand-rolled reference."""
    if augment_fn is not None:
        akey, key = jax.random.split(key)
        images = augment_fn(akey, images)
    if accum_steps <= 1:
        loss, grads = jax.value_and_grad(ddpm_loss_fn)(
            state.params, state.apply_fn, sched, images, key
        )
    else:
        b = images.shape[0]
        assert b % accum_steps == 0, (b, accum_steps)
        micro = images.reshape((accum_steps, b // accum_steps) + images.shape[1:])
        keys = jax.random.split(key, accum_steps)

        def one(carry, mk):
            mimgs, mkey = mk
            l, g = jax.value_and_grad(ddpm_loss_fn)(
                state.params, state.apply_fn, sched, mimgs, mkey
            )
            loss_acc, grad_acc = carry
            return (loss_acc + l,
                    jax.tree_util.tree_map(jnp.add, grad_acc, g)), None

        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (loss, grads), _ = jax.lax.scan(
            one, (jnp.zeros((), jnp.float32), zeros), (micro, keys)
        )
        inv = 1.0 / accum_steps
        loss = loss * inv
        grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
    state = state.apply_gradients(grads=grads)
    if state.ema is not None:
        state = state.replace(ema=state.ema.update(state.params))
    return state, loss


def make_train_step(
    sched: NoiseSchedule,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    augment_fn=None,
    fsdp: bool = False,
    accum_steps: int = 1,
):
    """Compile the DDPM train step, optionally laid out over a DP mesh.

    With a mesh, `images` must be sharded over ('data',) on its batch dim and
    the state replicated (see parallel.sharding.shard_batch / replicate);
    jit then compiles per-device compute + one ICI psum for the grads.

    With `fsdp=True` the state keeps whatever per-leaf shardings it arrives
    committed with (parallel.fsdp.shard_state_fsdp's ZeRO-3 layout: params +
    Adam moments + EMA sharded across 'data'); XLA inserts the all-gather at
    param use and reduce-scatters the grads, and donation keeps the updated
    shards in place. The step BODY is identical — only the jit layout
    annotations change (CLAUDE.md rule 4).

    On TPU the step compiles under a raised 32 MiB scoped-VMEM limit paired
    with attention.bwd_vmem_profile, which selects the flash backward's
    v2@bq256 kernel — the round-8 in-situ sweep winner (54.2 vs 57.0
    ms/step on the bench train program; PROFILE.md)."""
    step = partial(
        train_step, sched=sched, augment_fn=augment_fn, accum_steps=accum_steps
    )
    kwargs: dict[str, Any] = {}
    if donate:
        kwargs["donate_argnums"] = (0,)
    if mesh is not None:
        rep = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        if fsdp:
            # state: as-committed (per-leaf FSDP plan); loss: replicated
            kwargs["in_shardings"] = (None, data, rep)
            kwargs["out_shardings"] = (None, rep)
        else:
            kwargs["in_shardings"] = (rep, data, rep)
            kwargs["out_shardings"] = (rep, rep)
    copts = attention.train_compiler_options()
    if copts is None:
        return jax.jit(step, **kwargs)
    jitted = jax.jit(step, compiler_options=copts, **kwargs)

    @functools.wraps(jitted)
    def step_with_profile(*args, **kw):
        # only the trace-time entry matters; post-trace calls are free
        with attention.bwd_vmem_profile(attention._RAISED_VMEM_KIB):
            return jitted(*args, **kw)

    return step_with_profile


def make_eval_loss(sched: NoiseSchedule, apply_fn, mesh: Optional[Mesh] = None):
    """Jitted eval-only eps-MSE (deterministic val loss at a caller-fixed
    key; the reference has no diffusion val loop — framework extension).
    With a mesh, images arrive sharded over ('data',) and the scalar loss is
    replicated (mean reduces over the batch via XLA's ICI all-reduce)."""

    def eval_loss(params, images, key):
        return ddpm_loss_fn(params, apply_fn, sched, images, key)

    kwargs: dict[str, Any] = {}
    if mesh is not None:
        rep = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        kwargs["in_shardings"] = (rep, data, rep)
        kwargs["out_shardings"] = rep
    return jax.jit(eval_loss, **kwargs)


@struct.dataclass
class EMA:
    """Exponential moving average of params (framework extension — standard
    DDPM practice; the reference trains without EMA, which is one reason its
    only usable checkpoint is the legacy 1000-epoch one)."""

    decay: float
    params: Any

    @classmethod
    def create(cls, params, decay: float = 0.999) -> "EMA":
        # real copies, NOT jnp.asarray: the shadow must not alias the live
        # param buffers or donated train steps would donate them twice
        return cls(
            decay=decay,
            params=jax.tree_util.tree_map(lambda p: jnp.array(p, copy=True), params),
        )

    def update(self, new_params) -> "EMA":
        d = self.decay
        upd = jax.tree_util.tree_map(
            lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), self.params, new_params
        )
        return self.replace(params=upd)
