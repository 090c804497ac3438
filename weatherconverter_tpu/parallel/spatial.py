"""Spatial parallelism (the sequence-parallel analog for image models).

SURVEY.md §5: the reference's "sequence length" is image resolution — it
scales by avg-pooling gradients 512->128 and SRGAN-upscaling 128->512 on ONE
device. Here the high-resolution half of the guided-translation step (the
SRGAN output and the DeepLab forward+input-gradient over it) can instead be
sharded across mesh devices along the image-height axis: XLA's SPMD
partitioner inserts the halo exchanges every convolution needs at shard
boundaries and the cross-shard reductions for ASPP's global pooling — all
over ICI, no hand-written collectives (the same compiler contract the DP
path relies on).

When to use: guided sampling at resolutions whose HR activations exceed one
chip's HBM (1024px+ guidance), or to convert spare mesh width into latency
reduction for a single large image. At the 256px benchmark shape one chip is
compute-saturated and spatial sharding only adds halo traffic — DP over
images remains the throughput layout there (PROFILE.md).

Axis convention: ('data', 'space') — batch over 'data', image H over 'space'.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from weatherconverter_tpu.parallel.sharding import DATA_AXIS

SPACE_AXIS = "space"


def make_spatial_mesh(
    data: int = 1,
    space: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """('data', 'space') mesh: `data * space` must cover the device list;
    space defaults to all remaining devices."""
    devs = list(devices) if devices is not None else jax.devices()
    n = len(devs)
    if space is None:
        assert n % data == 0, f"{n} devices not divisible by data={data}"
        space = n // data
    assert data * space == n, f"data*space {data * space} != {n} devices"
    return Mesh(np.array(devs).reshape(data, space), (DATA_AXIS, SPACE_AXIS))


def spatial_image_sharding(mesh: Mesh, batch_sharded: bool = True) -> NamedSharding:
    """NHWC sharding: H over 'space' (and batch over 'data' when the mesh
    has a non-trivial data axis)."""
    b_axis = DATA_AXIS if batch_sharded and mesh.shape.get(DATA_AXIS, 1) > 1 else None
    return NamedSharding(mesh, P(b_axis, SPACE_AXIS, None, None))


def shard_spatial(mesh: Mesh, x, batch_sharded: bool = True):
    """Device-put an NHWC array (or pytree of them) H-sharded over 'space'."""
    sh = spatial_image_sharding(mesh, batch_sharded)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), x)


def constrain_spatial(x: jax.Array, mesh: Optional[Mesh], batch_sharded: bool = True):
    """`with_sharding_constraint` an intermediate NHWC tensor to the spatial
    layout (no-op without a mesh). Use inside jitted functions to force the
    HR part of a pipeline onto the 'space' axis."""
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(
        x, spatial_image_sharding(mesh, batch_sharded)
    )
