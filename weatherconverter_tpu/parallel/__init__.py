"""Device mesh + sharding (DP-first; XLA collectives over ICI)."""

from weatherconverter_tpu.parallel.sharding import (
    DATA_AXIS,
    MODEL_AXIS,
    data_sharding,
    local_batch_slice,
    make_mesh,
    pad_to_multiple,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "make_mesh", "data_sharding", "replicated",
    "shard_batch", "replicate", "pad_to_multiple", "local_batch_slice",
]
