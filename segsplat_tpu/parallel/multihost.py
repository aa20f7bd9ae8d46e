"""Multi-host (DCN) scale-out entry — SURVEY §5.8's "TPU-native equivalent".

The reference has no distributed layer; this wraps jax.distributed for
multi-host pods so the same (view, tensor) meshes span hosts: shardings are laid
out so the heavy collectives (voxel-accumulator psum, gradient psum) reduce
within a host's ICI-connected slice first, then across DCN.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> dict:
    """jax.distributed.initialize with env-based autodetection (TPU pods set
    the env automatically; explicit args for manual launches). Returns a
    topology summary."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)
    return topology()


def topology() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def make_global_mesh(n_tensor: int = 1):
    """A (view, tensor) mesh over ALL hosts' devices, with the tensor axis kept
    within a host (ICI) and the view axis spanning hosts (DCN) — the layout that
    keeps per-step allreduces on the fast interconnect."""
    from segsplat_tpu.parallel.mesh import make_mesh

    return make_mesh(n_tensor=n_tensor)
