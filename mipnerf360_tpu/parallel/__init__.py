"""Parallelism layer: mesh construction, shardings, multi-host init."""
from .mesh import (
    make_mesh,
    replicated,
    batch_sharding,
    shard_batch,
    param_shardings,
    shard_params,
)
from .sample_axis import make_sample_sharded_composite
