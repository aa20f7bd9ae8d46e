"""Multi-chip rendering: image-strip parallelism over the device mesh.

Alpha compositing is ordered along each ray, so Gaussian-axis sharding would
need depth-ordered partial-image merging; pixel-space sharding needs none — the
image splits into horizontal strips, every chip rasterizes its strip against
the (replicated) Gaussian table, and results concatenate shard-exactly. A strip
render is the SAME camera with a cropped viewport: height/devices rows and the
principal point shifted by the strip's row offset, so per-strip outputs are
bit-identical to the corresponding rows of the single-chip render (validated in
tests/test_parallel.py).

Per-chip work (projection, binning sort, blend) all shrink with the strip, so
this scales the dominant costs ~linearly until the per-strip Gaussian cull
stops helping (strips see mostly-disjoint Gaussian subsets).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from segsplat_tpu.ops.rasterize import TILE, rasterize
from segsplat_tpu.parallel.mesh import VIEW_AXIS


def rasterize_sharded(mesh: Mesh,
                      means3d, scales, quats, opacities, colors,
                      viewmat, fx, fy, cx, cy,
                      width: int, height: int,
                      bg: Optional[jax.Array] = None,
                      max_tiles_per_axis: int = 8, max_per_tile: int = 256,
                      backend: str = "xla", tile_chunk: int = 64):
    """Full-image rasterization with rows sharded over the mesh's view axis.

    height must be divisible by (devices · TILE). Returns {image [H, W, CH],
    alpha [H, W]} with the leading axis sharded over the mesh.
    """
    n_dev = mesh.shape[VIEW_AXIS]
    assert height % (n_dev * TILE) == 0, (
        f"height {height} must divide into {n_dev} TILE-aligned strips")
    strip_h = height // n_dev
    CH = colors.shape[1]
    if bg is None:
        bg = jnp.zeros((CH,), colors.dtype)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(VIEW_AXIS), P(VIEW_AXIS)),
    )
    def run(means3d, scales, quats, opacities, colors, viewmat, bg):
        row0 = jax.lax.axis_index(VIEW_AXIS).astype(jnp.float32) * strip_h
        # pass the FULL image's tan-FoV: the EWA frustum clamp must not depend
        # on the strip viewport or strip covariances drift from the reference
        out = rasterize(means3d, scales, quats, opacities, colors, viewmat,
                        fx, fy, cx, cy - row0, width, strip_h, bg=bg,
                        max_tiles_per_axis=max_tiles_per_axis,
                        max_per_tile=max_per_tile, tile_chunk=tile_chunk,
                        backend=backend,
                        tan_fovx=jnp.asarray(0.5 * width / fx, jnp.float32),
                        tan_fovy=jnp.asarray(0.5 * height / fy, jnp.float32))
        return out["image"], out["alpha"]

    image, alpha = run(means3d, scales, quats, opacities, colors, viewmat, bg)
    return {"image": image, "alpha": alpha}
