"""Multi-chip SPMD layer: device meshes, sharded feature lifting, parallel training.

New TPU-native design — the reference has no distributed layer at all (SURVEY §2.3).
"""

from segsplat_tpu.parallel.mesh import (TENSOR_AXIS, VIEW_AXIS, channel_sharding,
                                        make_mesh, replicated, view_sharding)
from segsplat_tpu.parallel.lift import lift_views_sharded
from segsplat_tpu.parallel.render import rasterize_sharded
from segsplat_tpu.parallel.train import make_parallel_train_step

__all__ = [
    "TENSOR_AXIS", "VIEW_AXIS", "channel_sharding", "make_mesh", "replicated",
    "view_sharding", "lift_views_sharded", "make_parallel_train_step",
    "rasterize_sharded",
]
