"""Device mesh and sharding utilities.

The reference is strictly single-GPU (SURVEY.md §2.4: no torch.distributed /
NCCL anywhere). This module is the capability uplift: data-parallel (and
optionally model-parallel) execution over a TPU slice expressed with
`jax.sharding.Mesh` + `NamedSharding`, letting XLA insert the gradient
all-reduce over ICI. No hand-written collectives are needed for DP — `jax.jit`
with sharded inputs + replicated params compiles to per-device compute with a
`psum` for the grads.

Axis convention:
  - "data" : batch sharding (DP). Gradient allreduce rides ICI.

Tensor parallelism is an explicit NON-goal (round-2 decision): the widest
layer in any model here is the UNet's 768-channel ladder at 16px — a few MB
of params and activations per chip — so a single v5e chip holds every model
with large headroom, and TP would spend ICI bandwidth to split work that
doesn't need splitting. DP (this module), multi-host DP
(parallel/distributed.py), spatial sharding (parallel/spatial.py), and
FSDP/ZeRO-3 state sharding (parallel/fsdp.py) are the scaling axes. Round 1
declared a 'model' mesh axis no code ever sharded over; per review it is
REMOVED rather than carried as a name without a user.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    data: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data',) DP mesh over the (local or global) devices — the
    layout the BASELINE.json north-star specifies ("shards over a v5e mesh
    with gradient allreduce over ICI")."""
    devs = list(devices) if devices is not None else jax.devices()
    n = len(devs)
    if data is None:
        data = n
    assert data == n, f"mesh width {data} != {n} devices"
    return Mesh(np.array(devs), (DATA_AXIS,))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard leading (batch) dim over the data axis, replicate the rest."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with batch-dim sharding."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), batch
    )


def replicate(mesh: Mesh, tree):
    """Device-put a pytree fully replicated over the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(batch, multiple: int):
    """Pad the leading dim of every leaf to a multiple (static-shape
    friendliness for pjit when the dataset size doesn't divide the mesh)."""

    def _pad(x):
        b = x.shape[0]
        rem = (-b) % multiple
        if rem == 0:
            return x
        pad_width = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), pad_width, mode="edge")

    return jax.tree_util.tree_map(_pad, batch)


@contextmanager
def maybe_mesh(mesh: Optional[Mesh]):
    if mesh is None:
        yield
    else:
        with mesh:
            yield


def plan_data_parallel(
    per_device_batch: int,
    scale_to_mesh: bool = True,
    n_devices: Optional[int] = None,
) -> tuple[int, int]:
    """TPU-native DP planning: (dp_width, global_batch).

    With `scale_to_mesh` (the default) the GLOBAL batch scales to the
    hardware — dp = all devices, global = per_device_batch * dp — instead of
    shrinking the mesh to a host-configured batch (a reference-style batch=4
    would otherwise idle 4 of 8 chips). Callers that scale the batch should
    consider linear LR scaling (Goyal et al. 2017); the training loops expose
    `scale_lr_with_batch` for that. With scale_to_mesh=False the batch is
    treated as global and dp falls back to its largest divisor <= devices.
    """
    n = n_devices if n_devices is not None else jax.device_count()
    if scale_to_mesh and n > 1:
        return n, per_device_batch * n
    return choose_dp_width(per_device_batch, n), per_device_batch


def choose_dp_width(batch_size: int, n_devices: Optional[int] = None) -> int:
    """Largest divisor of `batch_size` that is <= the device count — the DP
    width a training loop can use without padding (XLA requires the sharded
    dim divisible by the mesh axis)."""
    n = n_devices if n_devices is not None else jax.device_count()
    for w in range(min(batch_size, n), 0, -1):
        if batch_size % w == 0:
            return w
    return 1


def local_batch_slice(global_batch: int, mesh: Mesh) -> int:
    """Per-device batch under DP."""
    n = mesh.shape[DATA_AXIS]
    assert global_batch % n == 0, f"batch {global_batch} % data axis {n} != 0"
    return global_batch // n
