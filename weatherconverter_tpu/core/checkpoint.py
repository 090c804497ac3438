"""Checkpoint save/restore.

Replaces the reference's torch.save dicts — diffusion
{model_state_dict, optimizer_state_dict, epoch} (reference:
diffusion_model/train_ddpm.py:56-60), seg adds scheduler_state_dict and loss
(reference: seg_model/train.py:94-100) — with Orbax async checkpointing of
the full functional train state (params + opt state + batch_stats + step),
plus best-model bookkeeping equal to the reference's best-mIoU selection
(seg train.py:257-260).

Orbax is the TPU-native choice: async device-to-host gather, atomic
directory commit, and sharded-array aware restore for multi-host runs. A
plain-numpy fallback (`save_pytree_npz` / `load_pytree_npz`) covers
environments without orbax. The torch-ckpt import/export bridge lives in
weatherconverter_tpu/compat/.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Optional

import jax
import numpy as np


# ---------------------------------------------------------------------------
# Orbax (primary)
# ---------------------------------------------------------------------------


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


class CheckpointManager:
    """Epoch-indexed checkpoint manager with keep-N and best-metric tracking.

    Mirrors the reference's behavior: periodic save every save_interval
    epochs (train_ddpm.py:140-141) + separate best checkpoint by metric
    (seg train.py:257-260).
    """

    def __init__(
        self,
        directory: str,
        max_to_keep: int = 3,
        best_metric_name: Optional[str] = None,
        best_mode: str = "max",
    ):
        ocp = _ocp()
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
            ),
        )
        self.best_metric_name = best_metric_name
        self.best_mode = best_mode
        self._best_path = os.path.join(self.directory, "best.json")

    def save(self, step: int, state: Any, metrics: Optional[dict] = None) -> None:
        ocp = _ocp()
        self.manager.save(step, args=ocp.args.StandardSave(state))
        if metrics and self.best_metric_name and self.best_metric_name in metrics:
            current = float(metrics[self.best_metric_name])
            best = self.best_value()
            better = (
                best is None
                or (self.best_mode == "max" and current > best)
                or (self.best_mode == "min" and current < best)
            )
            if better:
                with open(self._best_path, "w") as f:
                    json.dump(
                        {"step": step, self.best_metric_name: current}, f
                    )

    def best_value(self) -> Optional[float]:
        if not os.path.exists(self._best_path):
            return None
        with open(self._best_path) as f:
            return float(json.load(f)[self.best_metric_name])

    def best_step(self) -> Optional[int]:
        if not os.path.exists(self._best_path):
            return None
        with open(self._best_path) as f:
            return int(json.load(f)["step"])

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, step: Optional[int] = None, target: Any = None) -> Any:
        ocp = _ocp()
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        if target is not None:
            return self.manager.restore(
                step, args=ocp.args.StandardRestore(target)
            )
        return self.manager.restore(step)

    def wait(self) -> None:
        self.manager.wait_until_finished()

    def close(self) -> None:
        self.manager.close()


# ---------------------------------------------------------------------------
# Plain-numpy fallback (single-host, no orbax)
# ---------------------------------------------------------------------------


def save_pytree_npz(path: str, tree: Any) -> None:
    """Flatten a pytree of arrays to an .npz with path-keyed entries."""
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(_kp_str(k) for k in kp)
        flat[key] = np.asarray(leaf)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def load_pytree_npz(path: str, target: Any) -> Any:
    """Restore into the structure of `target` (keys must match)."""
    data = np.load(path)
    leaves_paths = jax.tree_util.tree_flatten_with_path(target)
    flat, treedef = leaves_paths
    out_leaves = []
    for kp, leaf in flat:
        key = "/".join(_kp_str(k) for k in kp)
        arr = data[key]
        out_leaves.append(arr.astype(np.asarray(leaf).dtype).reshape(np.shape(leaf)))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(target), out_leaves
    )


def _kp_str(k) -> str:
    if hasattr(k, "key"):
        return str(k.key)
    if hasattr(k, "idx"):
        return str(k.idx)
    if hasattr(k, "name"):
        return str(k.name)
    return str(k)


# ---------------------------------------------------------------------------
# Run-directory allocator (reference: diffusion_model/utils.py:43-73 and
# seg_model/utils/utils.py:48-78 — both allocate runs/<id> with max+1)
# ---------------------------------------------------------------------------


def find_max_run_id(base: str) -> int:
    if not os.path.isdir(base):
        return -1
    best = -1
    for name in os.listdir(base):
        m = re.fullmatch(r"(\d+)", name)
        if m:
            best = max(best, int(m.group(1)))
    return best


def create_run(base: str) -> str:
    """Allocate the next numbered run directory with checkpoints/ and
    samples/ subdirs (reference: diffusion_model/utils.py:58-73)."""
    run_id = find_max_run_id(base) + 1
    run_dir = os.path.join(base, str(run_id))
    os.makedirs(os.path.join(run_dir, "checkpoints"), exist_ok=True)
    os.makedirs(os.path.join(run_dir, "samples"), exist_ok=True)
    return run_dir


def restore_auto(path: str, target: Any, prefer_best: bool = True) -> Any:
    """Restore `target` from any checkpoint artifact this framework writes:

      - a .npz fallback file,
      - a CheckpointManager run directory (numeric step subdirs; picks the
        best.json step when present and `prefer_best`, else the latest —
        the reference's best-mIoU consumption pattern, seg train.py:257-260),
      - a single Orbax StandardCheckpointer step directory.
    """
    if path.endswith(".npz"):
        return load_pytree_npz(path, target)
    steps = [d for d in (os.listdir(path) if os.path.isdir(path) else []) if d.isdigit()]
    if steps:
        mgr = CheckpointManager(path)
        step = None
        if prefer_best:
            mgr.best_metric_name = _best_metric_name(path)
            step = mgr.best_step() if mgr.best_metric_name else None
        try:
            out = mgr.restore(step=step, target=target)
        except Exception:
            # target structure differs from what the run saved (e.g. the run
            # checkpointed a full TrainState but the consumer wants bare
            # {'params','batch_stats'} variables): restore raw and project
            # onto the target's top-level keys.
            raw = mgr.restore(step=step, target=None)
            cand = raw
            if isinstance(raw, (list, tuple)):
                # multi-state checkpoints (e.g. the SRGAN loop's
                # (gen_state, disc_state) tuple): pick the element carrying
                # the target's keys (the generator comes first)
                cand = next(
                    (
                        e
                        for e in raw
                        if isinstance(e, dict) and all(k in e for k in target)
                    ),
                    None,
                ) if isinstance(target, dict) else None
            if isinstance(target, dict) and isinstance(cand, dict):
                out = {k: cand[k] for k in target if k in cand}
            else:
                out = _merge_into_target(target, raw)
        mgr.close()
        return out
    ocp = _ocp()
    return ocp.StandardCheckpointer().restore(path, target)


def _merge_into_target(target: Any, raw: Any) -> Any:
    """Best-effort restore of a structured target (e.g. a TrainState) from a
    raw checkpoint whose pytree structure differs — the checkpoint may
    predate fields added later (a pre-EMA DDPMTrainState) or carry extras.
    Keys present in both are taken from the checkpoint recursively; keys
    only in the target keep their initialized values. Never returns the raw
    dict for a dataclass target (which would crash the caller later at the
    first attribute access)."""
    from flax import serialization

    try:
        tdict = serialization.to_state_dict(target)
    except Exception:
        return raw

    def merge(t, r):
        # Orbax's target-less restore yields LISTS where flax state-dicts
        # use {'0': ..., '1': ...} for tuple nodes (e.g. optax opt_state)
        if isinstance(t, dict) and isinstance(r, (list, tuple)):
            r = {str(i): v for i, v in enumerate(r)}
        if isinstance(t, dict) and isinstance(r, dict):
            return {k: merge(v, r[k]) if k in r else v for k, v in t.items()}
        return r if r is not None else t

    if isinstance(raw, (list, tuple)):
        # Orbax target-less restore yields a top-level LIST for multi-state
        # checkpoints (e.g. the SRGAN loop's (gen_state, disc_state) tuple);
        # promote it the same way merge() promotes nested tuple nodes so a
        # tuple target (possibly with later-added fields) still merges.
        raw = {str(i): v for i, v in enumerate(raw)}
    if not isinstance(raw, dict):
        return raw
    merged = merge(tdict, raw)
    try:
        return serialization.from_state_dict(target, merged)
    except Exception:
        return raw


def _best_metric_name(path: str) -> Optional[str]:
    best = os.path.join(path, "best.json")
    if not os.path.exists(best):
        return None
    with open(best) as f:
        data = json.load(f)
    for k in data:
        if k != "step":
            return k
    return None
