"""Device-mesh parallelism: training data-parallel helpers and
multi-stream sharded serving."""

from joshupscale_tpu.parallel.mesh import (
    create_mesh,
    replicate,
    shard_batch,
)
from joshupscale_tpu.parallel.pipeline import PipelinedEngine
from joshupscale_tpu.parallel.serving import (
    ShardedEngine,
    SpatialEngine,
)

__all__ = [
    "create_mesh",
    "shard_batch",
    "replicate",
    "PipelinedEngine",
    "ShardedEngine",
    "SpatialEngine",
]
