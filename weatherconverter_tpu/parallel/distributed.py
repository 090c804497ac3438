"""Multi-host initialization.

The reference is strictly single-process/single-GPU (SURVEY.md §2.4). For
multi-host TPU slices (e.g. v5e-16+ across hosts) JAX needs one
`jax.distributed.initialize()` per host before any backend use; after that,
`jax.devices()` is the GLOBAL device list and the existing DP mesh +
NamedSharding code in parallel/sharding.py works unchanged — XLA routes the
gradient all-reduce over ICI within a slice and DCN across slices.

Single-host runs (including this benchmark environment, which exposes one
chip) skip initialization entirely, so every entry point can call
`maybe_initialize_distributed()` unconditionally.
"""

from __future__ import annotations

import os

_INITIALIZED = False


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed when multi-host env config is present.

    Honors the standard JAX coordination variables: either the TPU pod
    auto-detection (initialize() with no args inside a pod slice, signalled
    by TPU_WORKER_HOSTNAMES/MEGASCALE_* being set) or explicit
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID. Returns
    True when distributed mode was initialized."""
    global _INITIALIZED
    if _INITIALIZED:
        return True

    import jax

    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    explicit = coord and os.environ.get("JAX_NUM_PROCESSES")
    # auto-detect only for GENUINE multi-host slices: TPU_WORKER_HOSTNAMES is
    # present even on single-host images (this one sets it with one entry)
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    auto = ("," in hostnames) or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    if not explicit and not auto:
        return False
    if explicit:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
    else:
        jax.distributed.initialize()
    _INITIALIZED = True
    return True


def global_batch_from_local(mesh, local_batch):
    """Assemble a globally-sharded batch from THIS process's local shard —
    the multi-host analog of sharding.shard_batch: each host contributes
    its local examples and the result is one global jax.Array sharded over
    the mesh's data axis (per-host data loading, the standard multi-host
    input pipeline)."""
    import jax
    import numpy as np

    from weatherconverter_tpu.parallel.sharding import data_sharding

    local = np.asarray(local_batch)
    sharding = data_sharding(mesh, local.ndim)
    global_shape = (local.shape[0] * jax.process_count(),) + tuple(local.shape[1:])
    return jax.make_array_from_process_local_data(sharding, local, global_shape)


def process_count() -> int:
    import jax

    return jax.process_count()


def is_primary() -> bool:
    """Only the primary host should write checkpoints/logs in multi-host runs."""
    import jax

    return jax.process_index() == 0
