"""Aux subsystem tests: checkpointing (orbax + npz fallback), run-dir
allocator, metrics logger, profiling utilities."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weatherconverter_tpu.core.checkpoint import (
    CheckpointManager,
    create_run,
    find_max_run_id,
    load_pytree_npz,
    save_pytree_npz,
)
from weatherconverter_tpu.core.logging import MetricsLogger
from weatherconverter_tpu.core.profiling import (
    StepTimer,
    annotate,
    device_memory_stats,
    format_memory,
)


def test_npz_roundtrip(tmp_path):
    tree = {"a": {"w": jnp.arange(6.0).reshape(2, 3)}, "b": jnp.ones(4, jnp.int32)}
    p = str(tmp_path / "ck.npz")
    save_pytree_npz(p, tree)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, tree)
    out = load_pytree_npz(p, zeros)
    np.testing.assert_array_equal(np.asarray(out["a"]["w"]), np.asarray(tree["a"]["w"]))
    np.testing.assert_array_equal(np.asarray(out["b"]), np.asarray(tree["b"]))


def test_run_dir_allocator(tmp_path):
    """(reference: diffusion_model/utils.py:43-73 — next id = max + 1)."""
    base = str(tmp_path / "runs")
    r0 = create_run(base)
    r1 = create_run(base)
    assert r0.endswith("/0") and r1.endswith("/1")
    assert os.path.isdir(os.path.join(r0, "checkpoints"))
    assert find_max_run_id(base) == 1


def test_orbax_manager_best_tracking(tmp_path):
    state = {"w": jnp.ones(3), "step": jnp.asarray(1)}
    mgr = CheckpointManager(
        str(tmp_path / "ck"), best_metric_name="Mean IoU", best_mode="max"
    )
    mgr.save(1, state, metrics={"Mean IoU": 0.5})
    mgr.save(2, jax.tree_util.tree_map(lambda x: x * 2, state), metrics={"Mean IoU": 0.4})
    mgr.wait()
    assert mgr.best_step() == 1  # 0.4 did not beat 0.5
    assert mgr.latest_step() == 2
    restored = mgr.restore(2, target=jax.tree_util.tree_map(jnp.zeros_like, state))
    np.testing.assert_allclose(np.asarray(restored["w"]), 2.0)
    mgr.close()


def test_metrics_logger_jsonl(tmp_path):
    lg = MetricsLogger(str(tmp_path / "run"), config={"a": 1}, use_wandb=False)
    lg.log({"loss": jnp.asarray(0.5), "x": 2}, step=3)
    lg.finish()
    lines = open(str(tmp_path / "run" / "metrics.jsonl")).read().strip().splitlines()
    rec = json.loads(lines[-1])
    assert rec["loss"] == 0.5 and rec["_step"] == 3
    assert json.load(open(str(tmp_path / "run" / "config.json"))) == {"a": 1}


def test_step_timer_skips_warmup():
    t = StepTimer(warmup=1)
    for _ in range(4):
        with t:
            pass
    s = t.summary()
    assert s["steps"] == 3 and "p50_s" in s


def test_profiling_helpers_run():
    with annotate("test-region"):
        _ = jnp.ones(3) + 1
    stats = device_memory_stats()
    assert isinstance(stats, dict)
    assert isinstance(format_memory(), str)


def test_restore_auto_into_state_with_added_field(tmp_path):
    """Resuming a TrainState from a checkpoint written before a field
    existed (e.g. pre-EMA runs) merges matching keys and keeps the new
    field's initialized value — instead of returning a raw dict that
    crashes the caller (review round 3)."""
    import jax
    import jax.numpy as jnp
    import optax
    from flax import struct
    from flax.training import train_state

    from weatherconverter_tpu.core.checkpoint import CheckpointManager, restore_auto

    class OldState(train_state.TrainState):
        epoch: int = 0

    class NewState(train_state.TrainState):
        epoch: int = 0
        extra: jnp.ndarray = struct.field(default=None)

    params = {"w": jnp.ones((3,))}
    tx = optax.sgd(0.1)
    old = OldState.create(apply_fn=None, params=params, tx=tx).replace(epoch=7)
    ckpt = CheckpointManager(str(tmp_path / "ck"))
    ckpt.save(1, jax.device_get(old))
    ckpt.wait()

    new_t = NewState.create(
        apply_fn=None, params={"w": jnp.zeros((3,))}, tx=tx
    ).replace(extra=jnp.full((2,), 5.0))
    out = restore_auto(str(tmp_path / "ck"), new_t, prefer_best=False)
    assert isinstance(out, NewState)
    assert int(out.epoch) == 7
    assert float(out.params["w"][0]) == 1.0  # restored
    assert float(out.extra[0]) == 5.0  # kept from target init


def test_restore_auto_tuple_target_with_added_field(tmp_path):
    """The SRGAN loop checkpoints a (gen_state, disc_state) TUPLE; orbax's
    target-less restore yields a top-level LIST for it. A tuple target whose
    states gained a field since the checkpoint was written must still merge
    (advisor round 1: _merge_into_target early-returned the raw list and
    loop_srgan.train crashed at int(gs.step))."""
    import jax
    import jax.numpy as jnp
    import optax
    from flax import struct
    from flax.training import train_state

    from weatherconverter_tpu.core.checkpoint import CheckpointManager, restore_auto

    class OldState(train_state.TrainState):
        pass

    class NewState(train_state.TrainState):
        extra: jnp.ndarray = struct.field(default=None)

    tx = optax.sgd(0.1)
    gen = OldState.create(apply_fn=None, params={"w": jnp.ones((3,))}, tx=tx)
    disc = OldState.create(apply_fn=None, params={"v": jnp.full((2,), 2.0)}, tx=tx)
    gen = gen.replace(step=11)
    ckpt = CheckpointManager(str(tmp_path / "ck"))
    ckpt.save(1, jax.device_get((gen, disc)))
    ckpt.wait()

    new_gen = NewState.create(
        apply_fn=None, params={"w": jnp.zeros((3,))}, tx=tx
    ).replace(extra=jnp.full((4,), 9.0))
    new_disc = NewState.create(
        apply_fn=None, params={"v": jnp.zeros((2,))}, tx=tx
    ).replace(extra=jnp.full((4,), 9.0))
    out = restore_auto(str(tmp_path / "ck"), (new_gen, new_disc), prefer_best=False)
    gs, ds = out
    assert isinstance(gs, NewState) and isinstance(ds, NewState)
    assert int(gs.step) == 11  # the exact access that used to crash
    assert float(gs.params["w"][0]) == 1.0 and float(ds.params["v"][0]) == 2.0
    assert float(gs.extra[0]) == 9.0  # later-added field keeps its init


def test_debug_tensor_image_label_and_npy_fallback(tmp_path, capsys):
    """debug_tensor (reference translation.py:17-39 analog): [-1,1] float
    images save clamped PNGs, integer label maps save COLORIZED (and print
    unique values like the reference's gt branch), non-image shapes fall
    back to .npy instead of crashing."""
    from PIL import Image

    from weatherconverter_tpu.utils.debug import debug_tensor

    img = np.linspace(-2.0, 2.0, 2 * 8 * 8 * 3, dtype=np.float32).reshape(
        2, 8, 8, 3
    )
    p = debug_tensor(img, str(tmp_path / "img.png"), "img")
    assert p.endswith(".png") and os.path.exists(p)
    arr = np.asarray(Image.open(p))
    assert arr.min() >= 0 and arr.max() <= 255

    lbl = np.full((8, 8), 255, dtype=np.uint8)
    lbl[:4] = 0  # train-id 0 = road (128, 64, 128); 255 renders black
    p = debug_tensor(lbl, str(tmp_path / "lbl.png"), "gt")
    out = capsys.readouterr().out
    assert "unique values" in out
    arr = np.asarray(Image.open(p))
    assert arr.shape[-1] == 3 and (arr == 128).any()

    vec = np.arange(7, dtype=np.float32)
    p = debug_tensor(vec, str(tmp_path / "vec.png"))
    assert p.endswith(".npy") and np.allclose(np.load(p), vec)

    # SRGAN-range output: from_range='unit' must not crush [0,1] into the
    # upper half the pm1 mapping would
    unit = np.zeros((4, 4, 3), dtype=np.float32)
    p = debug_tensor(unit, str(tmp_path / "unit.png"), from_range="unit")
    assert np.asarray(Image.open(p)).max() == 0
