"""Train-step tests: DDPM DP step over the 8-device mesh, seg train/eval
steps with BatchNorm threading and input-grad instrumentation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weatherconverter_tpu.core.config import UnetModelConfig
from weatherconverter_tpu.diffusion.schedule import linear_schedule
from weatherconverter_tpu.models.factory import make_seg_model
from weatherconverter_tpu.models.unet import Unet
from weatherconverter_tpu.parallel.sharding import (
    make_mesh,
    replicate,
    shard_batch,
)
from weatherconverter_tpu.training.diffusion import (
    EMA,
    create_ddpm_state,
    make_train_step,
)
from weatherconverter_tpu.training.losses import make_seg_loss
from weatherconverter_tpu.training.optim import make_seg_optimizer
from weatherconverter_tpu.training.segmentation import (
    create_seg_state,
    make_seg_eval_step,
    make_seg_train_step,
)


def tiny_unet():
    cfg = UnetModelConfig(
        im_channels=3,
        im_size=16,
        down_channels=[8, 16, 24],
        mid_channels=[24, 24, 16],
        down_sample=[True, False],
        time_emb_dim=16,
        num_down_layers=1,
        num_mid_layers=1,
        num_up_layers=1,
        num_heads=2,
        attn_resolutions=[8],
    )
    return Unet(config=cfg, fused=False)


def test_ddpm_train_step_descends_and_dp_matches_single():
    sched = linear_schedule(10)
    model = tiny_unet()
    state = create_ddpm_state(model, jax.random.PRNGKey(0), im_size=16, lr=1e-3)
    images = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 3))
    key = jax.random.PRNGKey(2)

    # single-device step
    step1 = make_train_step(sched, mesh=None, donate=False)
    s1, loss1 = step1(state, images, key)

    # 8-way DP step: identical math, batch sharded over the mesh
    mesh = make_mesh()
    step8 = make_train_step(sched, mesh=mesh, donate=False)
    st8 = replicate(mesh, state)
    im8 = shard_batch(mesh, images)
    s8, loss8 = step8(st8, im8, replicate(mesh, key))

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-4)
    l1 = jax.tree_util.tree_leaves(s1.params)[0]
    l8 = jax.tree_util.tree_leaves(s8.params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l8), rtol=1e-4, atol=1e-5)


def test_ddpm_loss_decreases_over_steps():
    sched = linear_schedule(10)
    model = tiny_unet()
    state = create_ddpm_state(model, jax.random.PRNGKey(0), im_size=16, lr=1e-3)
    step = make_train_step(sched, mesh=None, donate=True)
    images = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3)) * 0.1
    key = jax.random.PRNGKey(3)
    losses = []
    for i in range(8):
        key, sub = jax.random.split(key)
        state, loss = step(state, images, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_ema_moves_toward_params():
    p0 = {"w": jnp.zeros(3)}
    ema = EMA.create(p0, decay=0.5)
    ema = ema.update({"w": jnp.ones(3)})
    np.testing.assert_allclose(np.asarray(ema.params["w"]), 0.5)


@pytest.fixture(scope="module")
def seg_setup():
    model_t = make_seg_model("deeplabv3_resnet18", num_classes=5, train=True)
    model_e = make_seg_model("deeplabv3_resnet18", num_classes=5, train=False)
    key = jax.random.PRNGKey(0)
    params_tree = model_t.init(key, jnp.zeros((1, 32, 32, 3)))
    tx_params = params_tree["params"]

    class OptCfg:
        params = {"lr": 0.01, "momentum": 0.9, "weight_decay": 1e-4}
        layerwise_lr = {"backbone": 0.001, "classifier": 0.01}

    tx = make_seg_optimizer(tx_params, OptCfg, max_iters=100)
    state = create_seg_state(model_t, key, tx, input_hw=(32, 32))
    return model_t, model_e, state


def test_seg_train_step_updates_and_instruments(seg_setup):
    model_t, model_e, state = seg_setup
    loss_fn = make_seg_loss("CrossEntropyLoss", {"ignore_index": 255})
    step = make_seg_train_step(loss_fn, mesh=None, input_grad=True, donate=False)
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    labels = jax.random.randint(jax.random.PRNGKey(2), (2, 32, 32), 0, 5)
    new_state, loss, ig = step(state, images, labels)
    assert np.isfinite(float(loss))
    assert float(ig) > 0.0  # input-gradient instrumentation live
    # params changed
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))
    # batch_stats changed (BatchNorm running stats threaded)
    sa = jax.tree_util.tree_leaves(state.batch_stats)[0]
    sb = jax.tree_util.tree_leaves(new_state.batch_stats)[0]
    assert not np.allclose(np.asarray(sa), np.asarray(sb))


def test_seg_eval_step_confusion(seg_setup):
    model_t, model_e, state = seg_setup
    ev = make_seg_eval_step(model_e, num_classes=5)
    conf = jnp.zeros((5, 5))
    images = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 3))
    labels = jax.random.randint(jax.random.PRNGKey(4), (2, 32, 32), 0, 5)
    conf = ev(state.params, state.batch_stats, conf, images, labels)
    assert float(jnp.sum(conf)) == 2 * 32 * 32


def test_ema_wired_into_train_step_and_diverges():
    """VERDICT r1 item 8: EMA must update inside the jitted step and track a
    different point than the live params."""
    from weatherconverter_tpu.diffusion.schedule import linear_schedule
    from weatherconverter_tpu.training.diffusion import create_ddpm_state, make_train_step

    model = tiny_unet()
    state = create_ddpm_state(
        model, jax.random.PRNGKey(0), im_size=16, lr=1e-2, ema_decay=0.9
    )
    assert state.ema is not None
    step = make_train_step(linear_schedule(20), donate=False)
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    for i in range(3):
        state, _ = step(state, images, jax.random.PRNGKey(2 + i))
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    ema_leaf = jax.tree_util.tree_leaves(state.ema.params)[0]
    diff = float(jnp.max(jnp.abs(leaf - ema_leaf)))
    assert diff > 1e-6  # live params moved faster than the EMA shadow


def test_cli_sample_prefers_ema_params(tmp_path):
    """A run-dir checkpoint carrying an EMA shadow must sample from it."""
    from weatherconverter_tpu.cli.commands import _load_unet_params
    from weatherconverter_tpu.core.checkpoint import CheckpointManager
    from weatherconverter_tpu.core.config import DiffusionConfig
    from weatherconverter_tpu.training.diffusion import create_ddpm_state

    model = tiny_unet()
    state = create_ddpm_state(
        model, jax.random.PRNGKey(0), im_size=16, lr=1e-3, ema_decay=0.5
    )
    # make EMA distinguishable from live params
    bumped = jax.tree_util.tree_map(lambda x: x + 1.0, state.params)
    state = state.replace(ema=state.ema.replace(params=bumped))
    mgr = CheckpointManager(str(tmp_path / "checkpoints"))
    mgr.save(1, jax.device_get(state))
    mgr.wait()
    mgr.close()

    cfg = DiffusionConfig()
    cfg.model = model.config
    got = _load_unet_params(model, str(tmp_path / "checkpoints"), cfg, jax.random.PRNGKey(3))
    want_leaf = jax.tree_util.tree_leaves(bumped)[0]
    got_leaf = jax.tree_util.tree_leaves(got)[0]
    np.testing.assert_allclose(np.asarray(got_leaf), np.asarray(want_leaf), atol=1e-6)


def test_ddpm_grad_accumulation_matches_reference_semantics():
    """accum_steps=2 must equal the hand-rolled mean of the two microbatch
    gradients at the SAME split keys (one optimizer + EMA update), pinning
    the estimator semantics exactly (training/diffusion.train_step)."""
    import optax

    from weatherconverter_tpu.training.diffusion import ddpm_loss_fn, train_step

    sched = linear_schedule(10)
    model = tiny_unet()
    # SGD, not Adam: the param delta then IS -lr * mean-grad, so the grad
    # semantics can be compared tightly (Adam's m/sqrt(v) flips sign on fp
    # noise for near-zero grads and defeats any elementwise tolerance)
    import optax as _optax

    state = create_ddpm_state(
        model, jax.random.PRNGKey(0), im_size=16, lr=1e-3, ema_decay=0.9,
        tx=_optax.sgd(1e-3),
    )
    images = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 3))
    key = jax.random.PRNGKey(2)

    s_acc, loss_acc = jax.jit(
        lambda s, i, k: train_step(s, i, k, sched=sched, accum_steps=2)
    )(state, images, key)

    # hand-rolled reference: mean of per-microbatch grads at the same keys
    keys = jax.random.split(key, 2)
    micro = images.reshape(2, 4, 16, 16, 3)
    losses, grads = [], []
    for i in range(2):
        l, g = jax.value_and_grad(ddpm_loss_fn)(
            state.params, state.apply_fn, sched, micro[i], keys[i]
        )
        losses.append(l)
        grads.append(g)
    mean_g = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, *grads)
    s_ref = state.apply_gradients(grads=mean_g)
    s_ref = s_ref.replace(ema=s_ref.ema.update(s_ref.params))

    np.testing.assert_allclose(
        float(loss_acc), float((losses[0] + losses[1]) / 2.0), rtol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_acc.params),
        jax.tree_util.tree_leaves(s_ref.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_acc.ema.params),
        jax.tree_util.tree_leaves(s_ref.ema.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
    assert int(s_acc.step) == 1  # ONE optimizer update


def test_seg_grad_accumulation_runs_and_chains_bn(seg_setup):
    """Seg accumulation: one optimizer update from the mean microbatch
    gradient, BN running stats chained through the microbatches in order
    (torch grad-accum semantics)."""
    model_t, model_e, state = seg_setup
    loss_fn = make_seg_loss("CrossEntropyLoss", {"ignore_index": 255})
    images = jax.random.normal(jax.random.PRNGKey(5), (4, 32, 32, 3))
    labels = jax.random.randint(jax.random.PRNGKey(6), (4, 32, 32), 0, 5)

    step1 = make_seg_train_step(loss_fn, mesh=None, donate=False)
    s1, loss1, ig1 = step1(state, images, labels)

    step2 = make_seg_train_step(loss_fn, mesh=None, donate=False, accum_steps=2)
    s2, loss2, ig2 = step2(state, images, labels)

    assert np.isfinite(float(loss2)) and float(ig2) > 0.0
    # same data, same params: the two estimators are close but NOT identical
    # (loss1 is the full-batch pixel mean; loss2 the mean of microbatch
    # means; BN batch stats differ per microbatch)
    assert abs(float(loss1) - float(loss2)) < 0.25 * abs(float(loss1))
    # one optimizer update happened and BN stats moved
    a = jax.tree_util.tree_leaves(state.batch_stats)[0]
    b = jax.tree_util.tree_leaves(s2.batch_stats)[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))
    assert int(s2.step) == int(state.step) + 1


def test_ddpm_grad_accumulation_under_dp_mesh():
    """accum_steps composes with DP sharding (the microbatch reshape of the
    ('data',)-sharded batch dim is GSPMD-legal) and with FSDP state: losses
    match the single-device accumulated step."""
    from weatherconverter_tpu.parallel.fsdp import shard_state_fsdp

    sched = linear_schedule(10)
    model = tiny_unet()
    state = create_ddpm_state(model, jax.random.PRNGKey(0), im_size=16, lr=1e-3)
    images = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 3))
    key = jax.random.PRNGKey(2)

    s1, loss1 = make_train_step(sched, mesh=None, donate=False, accum_steps=2)(
        state, images, key
    )

    mesh = make_mesh()
    step = make_train_step(sched, mesh=mesh, donate=False, accum_steps=2, fsdp=True)
    st = shard_state_fsdp(mesh, state, min_shard_bytes=0)
    s8, loss8 = step(st, shard_batch(mesh, images), replicate(mesh, key))
    np.testing.assert_allclose(float(loss1), float(loss8), rtol=2e-5)
