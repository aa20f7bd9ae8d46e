"""Device-mesh construction for the segsplat pipeline.

The reference is strictly single-GPU/single-process (SURVEY §2.3: device hard-pinned
to cuda:0, utils/general_utils.py:133; no torch.distributed anywhere) — this layer is
new, idiomatic TPU design rather than a port.

Two mesh axes cover every stage of the pipeline:

  * ``view``  — data parallelism over cameras/views. Feature lifting shards the
    ≤216-view sweep (aggregate_voxel_features_onthefly.py:106) across chips and
    psum-reduces the voxel accumulators over ICI; training shards a view minibatch
    and psum-reduces gradients.
  * ``tensor`` — model/tensor parallelism over wide per-element axes: the 512-D
    LSeg feature channels during lifting, the 256-row codebook-logit axis during
    training, the 32 semantic raster channels at inference. These axes are
    embarrassingly shardable because blending weights/ray hits are computed once
    and applied per channel.

Multi-host scale-out (DCN) uses the same meshes built over
``jax.distributed.initialize``-discovered devices; shardings are laid out so the
heavy collectives (voxel psum, grad psum) ride ICI within a host's slice first.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

VIEW_AXIS = "view"
TENSOR_AXIS = "tensor"


def make_mesh(n_view: Optional[int] = None, n_tensor: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (view, tensor) mesh. Defaults to all devices on the view axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_view is None:
        n_view = len(devices) // n_tensor
    assert n_view * n_tensor == len(devices), (
        f"mesh {n_view}x{n_tensor} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(n_view, n_tensor)
    return Mesh(arr, (VIEW_AXIS, TENSOR_AXIS))


def view_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over views (batch of cameras / feature maps)."""
    return NamedSharding(mesh, P(VIEW_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def channel_sharding(mesh: Mesh, ndim: int, axis: int) -> NamedSharding:
    """Shard one (channel-like) axis over the tensor axis of the mesh."""
    spec = [None] * ndim
    spec[axis] = TENSOR_AXIS
    return NamedSharding(mesh, P(*spec))
