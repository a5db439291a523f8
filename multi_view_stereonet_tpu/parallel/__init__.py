"""Device-mesh / sharding helpers (data + view parallelism).

The reference's only scale-out axis was Horovod data parallelism
(SURVEY.md section 2; params.yaml:14). Here parallelism is expressed the
TPU-native way: a ``jax.sharding.Mesh`` with named axes and sharding
annotations; XLA inserts the collectives (gradient psum over ICI).

Axes:
- ``data``: the batch axis (classic DP).
- ``view``: the comparison-view axis -- this workload's natural
  "model-ish" axis. All V per-view plane sweeps are independent until the
  final average over views, which XLA lowers to a small cross-view
  reduction; sharding V over ``view`` splits the dominant level-4 compute.
"""

from .mesh import make_mesh, batch_spec, replicated, shard_batch
from .distributed import (
    initialize, is_main_process, make_global_mesh, local_shard_indices,
    ShardedDataset, global_batch,
)

__all__ = [
    "make_mesh", "batch_spec", "replicated", "shard_batch",
    "initialize", "is_main_process", "make_global_mesh",
    "local_shard_indices", "ShardedDataset", "global_batch",
]
