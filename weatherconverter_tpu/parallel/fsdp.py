"""FSDP / ZeRO-3-style parameter + optimizer-state sharding over the DP mesh.

The reference is single-GPU and keeps one full copy of params + Adam moments
(SURVEY.md §2.4); plain DP (parallel/sharding.py) replicates that copy on
every chip. For models whose OPTIMIZER STATE dominates HBM (Adam doubles the
param bytes; EMA triples them), the TPU-native fix is to shard every large
state tensor across the existing ('data',) mesh and let XLA insert the
all-gather at use and the reduce-scatter on the gradient — exactly the ZeRO-3
/ jax "fully-sharded data parallel" recipe (no hand-written collectives; the
sharding annotations ARE the program).

Usage:
    state = create_ddpm_state(...)
    state = shard_state_fsdp(mesh, state)      # instead of replicate()
    step  = make_train_step(sched, mesh=mesh)  # unchanged — shardings
    state, loss = step(state, images, key)     # propagate through jit

Per-leaf policy (`fsdp_spec`): shard the LARGEST axis whose length divides
the mesh's data width; leaves smaller than `min_shard_bytes` (biases, norm
scales, scalar counters) stay replicated — sharding them would trade a
few bytes for a collective each.

This composes with multi-host DP (parallel/distributed.py): the mesh spans
all processes, so state shards span hosts too (each host stores 1/N of the
model — the property that lets a fleet hold models no single host can).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from weatherconverter_tpu.parallel.sharding import DATA_AXIS


def fsdp_spec(
    shape: tuple[int, ...],
    data_width: int,
    *,
    itemsize: int = 4,
    min_shard_bytes: int = 1 << 14,
) -> P:
    """PartitionSpec sharding the largest divisible axis over 'data'.

    Replicates when every axis is indivisible by the mesh width or the leaf
    is too small to be worth a collective (16 KiB default — below that the
    all-gather latency exceeds the memory saved)."""
    if not shape or int(np.prod(shape)) * itemsize < min_shard_bytes:
        return P()
    # largest axis first; ties broken toward the leading axis (batch-like
    # dims gather cheapest) — conv kernels (kh, kw, cin, cout) end up sharded
    # on cout/cin, exactly the per-device slices ZeRO-3 uses
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for ax in order:
        if shape[ax] % data_width == 0 and shape[ax] >= data_width:
            spec = [None] * len(shape)
            spec[ax] = DATA_AXIS
            return P(*spec)
    return P()


def fsdp_shardings(mesh: Mesh, tree: Any, **kw) -> Any:
    """Per-leaf NamedSharding pytree for `tree` under the FSDP policy."""
    width = mesh.shape[DATA_AXIS]

    def leaf(x):
        shape = tuple(np.shape(x))
        itemsize = getattr(np.asarray(x) if np.isscalar(x) else x, "dtype",
                           np.dtype("float32")).itemsize
        return NamedSharding(mesh, fsdp_spec(shape, width, itemsize=itemsize, **kw))

    return jax.tree_util.tree_map(leaf, tree)


def shard_state_fsdp(mesh: Mesh, state: Any, **kw) -> Any:
    """Device-put a train state (params + opt state + EMA + counters) with
    every large tensor sharded across the data axis. Drop-in replacement for
    parallel.sharding.replicate at state-creation/restore time; the jitted
    train step needs NO changes — jax propagates the input shardings and XLA
    inserts all-gather (param use) / reduce-scatter (grad) over ICI."""
    shardings = fsdp_shardings(mesh, state, **kw)
    return jax.tree_util.tree_map(jax.device_put, state, shardings)


def sharded_fraction(state: Any) -> float:
    """Fraction of state BYTES that carry a non-replicated sharding —
    observability for tests and memory planning."""
    total = 0
    sharded = 0
    for leaf in jax.tree_util.tree_leaves(state):
        if not isinstance(leaf, jax.Array):
            continue
        nbytes = leaf.size * leaf.dtype.itemsize
        total += nbytes
        spec = getattr(leaf.sharding, "spec", None)
        if spec and any(s is not None for s in spec):
            sharded += nbytes
    return sharded / total if total else 0.0


def assert_memory_sharded(state: Any, min_fraction: float = 0.9) -> None:
    """Raise unless at least `min_fraction` of the state bytes are sharded —
    the invariant that makes FSDP worth running."""
    frac = sharded_fraction(state)
    if frac < min_fraction:
        raise AssertionError(
            f"only {frac:.1%} of state bytes are sharded (< {min_fraction:.0%})"
        )


def maybe_shard_state(
    mesh: Optional[Mesh], state: Any, fsdp: bool = False, **kw
) -> Any:
    """Loop-facing helper: FSDP-shard when asked, else replicate (the DP
    default). Centralizes the choice so both training loops stay one-liner
    call sites (CLAUDE.md rule 4: never fork a train-step body)."""
    if mesh is None:
        return state
    if fsdp:
        return shard_state_fsdp(mesh, state, **kw)
    from weatherconverter_tpu.parallel.sharding import replicate

    return replicate(mesh, state)
