"""Core pytree types.

The reference stores Gaussians as a mutable ``GaussianModel`` of torch Parameters that
grow/shrink during densification (reference: scene/gaussian_model.py:48-164). XLA wants
static shapes, so the TPU-native design is a *fixed-capacity table with an activity
mask*: all arrays are allocated at ``capacity`` rows and ``active`` marks live rows.
Densify/clone/split/prune write into free slots (see segsplat_tpu/train/densify.py)
instead of reallocating.

The voxel grid mirrors the sparse Plenoxels-style grid the reference builds with
MinkowskiEngine-style quantization (reference: utils/hash_grid.py:742-801,
script/minkowski_voxel_grid_from_ply_advanced.py:136-151): integer coordinates plus
``origin``/``voxel_size`` metadata that the reference round-trips through PLY header
comments.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

NUM_OBJECTS = 16        # identity-feature channels (reference: scene/gaussian_model.py:58)
NUM_SEMANTIC_CHANNELS = 32  # logit raster channels (reference: voxel_to_gaussian/render_semantics_logits.py:50)
NUM_CODEBOOK = 256      # codebook rows (reference: train_unified_lift.py:295-297)


def _pytree_dataclass(cls=None, *, static: tuple = ()):
    """Register a dataclass as a JAX pytree with some fields static."""

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data_fields = [f.name for f in dataclasses.fields(c) if f.name not in static]
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=list(static)
        )
        return c

    return wrap(cls) if cls is not None else wrap


@_pytree_dataclass(static=("max_sh_degree",))
class GaussianTable:
    """Fixed-capacity Gaussian parameter table.

    Shapes (C = capacity, R = (max_sh_degree+1)**2 - 1):
      xyz            [C, 3]   world positions
      features_dc    [C, 1, 3]  SH DC color coefficients
      features_rest  [C, R, 3]  higher-order SH coefficients
      scaling        [C, 3]   log-scale (activation: exp)
      rotation       [C, 4]   unnormalized quaternion (activation: normalize)
      opacity        [C, 1]   logit opacity (activation: sigmoid)
      objects_dc     [C, 1, NUM_OBJECTS]  identity features
      active         [C]      bool, live-row mask
      active_sh_degree [] int32, current SH degree in use
    """

    xyz: jax.Array
    features_dc: jax.Array
    features_rest: jax.Array
    scaling: jax.Array
    rotation: jax.Array
    opacity: jax.Array
    objects_dc: jax.Array
    active: jax.Array
    active_sh_degree: jax.Array
    max_sh_degree: int = 3

    # -- activations (reference: scene/gaussian_model.py:30-45) ------------------
    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def num_active(self) -> jax.Array:
        return jnp.sum(self.active.astype(jnp.int32))

    def get_scaling(self) -> jax.Array:
        return jnp.exp(self.scaling)

    def get_rotation(self) -> jax.Array:
        return self.rotation / (
            jnp.linalg.norm(self.rotation, axis=-1, keepdims=True) + 1e-12
        )

    def get_opacity(self) -> jax.Array:
        return jax.nn.sigmoid(self.opacity)

    def get_features(self) -> jax.Array:
        """[C, 1+R, 3] concatenated SH coefficients."""
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    def get_objects(self) -> jax.Array:
        return self.objects_dc

    @staticmethod
    def empty(capacity: int, max_sh_degree: int = 3, dtype=jnp.float32) -> "GaussianTable":
        r = (max_sh_degree + 1) ** 2 - 1
        z = lambda *s: jnp.zeros(s, dtype)
        return GaussianTable(
            xyz=z(capacity, 3),
            features_dc=z(capacity, 1, 3),
            features_rest=z(capacity, r, 3),
            scaling=z(capacity, 3),
            rotation=jnp.concatenate(
                [jnp.ones((capacity, 1), dtype), jnp.zeros((capacity, 3), dtype)], axis=1
            ),
            opacity=z(capacity, 1),
            objects_dc=z(capacity, 1, NUM_OBJECTS),
            active=jnp.zeros((capacity,), jnp.bool_),
            active_sh_degree=jnp.zeros((), jnp.int32),
            max_sh_degree=max_sh_degree,
        )


@_pytree_dataclass(static=("shape",))
class VoxelGrid:
    """Sparse voxel grid.

    ``coords`` are non-negative integer voxel coordinates (x, y, z ordering, matching
    the reference's ``round((p - origin) / voxel_size)`` convention,
    cuda_project_image_to_sparse_voxel/build_sparse_occupancy.py:32-53).
    ``origin`` is the world position of voxel (0,0,0)'s *corner* for floor-quantized
    grids / *center* for round-quantized grids — carried explicitly so both reference
    conventions round-trip. ``shape`` is the dense (Z, Y, X) extent.
    """

    coords: jax.Array      # [V, 3] int32 (x, y, z)
    origin: jax.Array      # [3] float32 world-space origin
    voxel_size: jax.Array  # [] float32
    features: Optional[jax.Array] = None  # [V, F] optional per-voxel payload
    shape: tuple = ()      # (Z, Y, X) dense extent

    @property
    def num_voxels(self) -> int:
        return self.coords.shape[0]

    def centers(self) -> jax.Array:
        """World-space voxel centers, reference convention: coord*vs + origin
        (script/minkowski_voxel_grid_from_ply_advanced.py:144)."""
        return self.coords.astype(jnp.float32) * self.voxel_size + self.origin


@_pytree_dataclass(static=("width", "height"))
class Camera:
    """A pinhole camera, reference conventions (scene/cameras.py:18-66).

    R is camera-to-world rotation; T is the world-to-camera translation, i.e. the
    world-to-view matrix is [[R^T, T], [0, 1]] (utils/graphics_utils.py:getWorld2View2).
    """

    R: jax.Array             # [3, 3] c2w rotation
    T: jax.Array             # [3] w2c translation
    fov_x: jax.Array         # [] radians
    fov_y: jax.Array         # [] radians
    width: int = 0
    height: int = 0

    def world_view_transform(self) -> jax.Array:
        """[4,4] world→view matrix (row-vector convention of the reference:
        the reference stores the transpose for torch row-vector mults; we return the
        standard column-vector matrix W2C)."""
        w2c = jnp.zeros((4, 4), jnp.float32)
        w2c = w2c.at[:3, :3].set(self.R.T)
        w2c = w2c.at[:3, 3].set(self.T)
        w2c = w2c.at[3, 3].set(1.0)
        return w2c

    def camera_center(self) -> jax.Array:
        """World-space camera position = -R @ T (inverse of W2C)."""
        return -self.R @ self.T

    def intrinsics(self) -> jax.Array:
        """[3,3] K with principal point at the image center (reference:
        voxel_to_gaussian/render_semantics_logits.py:76-88)."""
        fx = self.width / (2.0 * jnp.tan(self.fov_x * 0.5))
        fy = self.height / (2.0 * jnp.tan(self.fov_y * 0.5))
        # built with scalar .at[].set()s: a nested-list jnp.array mixing
        # tracers with the concrete [0,0,1] row captures that row as a lifted
        # executable constant, which jax 0.9 loses on the second call of a
        # second same-process sharded program ("Execution supplied 47 buffers
        # but compiled program expected 49")
        K = jnp.zeros((3, 3), jnp.float32)
        K = K.at[0, 0].set(fx).at[1, 1].set(fy).at[2, 2].set(1.0)
        K = K.at[0, 2].set(self.width / 2.0).at[1, 2].set(self.height / 2.0)
        return K


def stack_cameras(cams) -> Camera:
    """Stack a list of same-resolution cameras into a batched Camera pytree."""
    assert len({(c.width, c.height) for c in cams}) == 1, "mixed resolutions"
    return Camera(
        R=jnp.stack([c.R for c in cams]),
        T=jnp.stack([c.T for c in cams]),
        fov_x=jnp.stack([jnp.asarray(c.fov_x) for c in cams]),
        fov_y=jnp.stack([jnp.asarray(c.fov_y) for c in cams]),
        width=cams[0].width,
        height=cams[0].height,
    )
