"""Pallas blend kernel vs the XLA reference blend (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from segsplat_tpu.ops import rasterize as Rz


def _scene(rng, n=500):
    xyz = (rng.random((n, 3)) * np.array([3.0, 2.0, 2.0])
           + np.array([-1.5, -1.0, 1.5])).astype(np.float32)
    scales = np.exp(rng.normal(-2.5, 0.3, (n, 3))).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    opac = rng.uniform(0.3, 0.95, (n,)).astype(np.float32)
    colors = rng.random((n, 8)).astype(np.float32)
    return (jnp.asarray(xyz), jnp.asarray(scales), jnp.asarray(q),
            jnp.asarray(opac), jnp.asarray(colors))


def test_pallas_blend_matches_xla(rng):
    xyz, scales, quats, opac, colors = _scene(rng)
    W, H = 64, 48
    fx = fy = 60.0
    vm = jnp.eye(4)
    bg = jnp.asarray(rng.random(8), jnp.float32)

    common = dict(width=W, height=H, max_tiles_per_axis=4)
    ref = Rz.rasterize(xyz, scales, quats, opac, colors, vm, fx, fy, W / 2, H / 2,
                       bg=bg, max_per_tile=128, tile_chunk=4, **common)
    with pltpu.force_tpu_interpret_mode():
        got = Rz.rasterize(xyz, scales, quats, opac, colors, vm, fx, fy,
                           W / 2, H / 2, bg=bg, max_per_tile=128,
                           backend="pallas", **common)

    assert np.asarray(ref["visible"]).sum() > 100, "scene must be visible"
    np.testing.assert_allclose(np.asarray(got["image"]), np.asarray(ref["image"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got["alpha"]), np.asarray(ref["alpha"]),
                               rtol=1e-4, atol=1e-4)


def test_pallas_blend_multi_block(rng):
    """K=256 forces two G=128 blocks through the running-transmittance carry."""
    xyz, scales, quats, opac, colors = _scene(rng, n=900)
    # concentrate splats so tiles overflow one block
    xyz = xyz * jnp.asarray([0.3, 0.3, 1.0]) + jnp.asarray([0.0, 0.0, 0.5])
    W = H = 32
    fx = fy = 40.0
    vm = jnp.eye(4)
    bg = jnp.zeros((8,), jnp.float32)

    common = dict(width=W, height=H, max_tiles_per_axis=4)
    ref = Rz.rasterize(xyz, scales, quats, opac, colors, vm, fx, fy, W / 2, H / 2,
                       bg=bg, max_per_tile=256, tile_chunk=4, **common)
    with pltpu.force_tpu_interpret_mode():
        got = Rz.rasterize(xyz, scales, quats, opac, colors, vm, fx, fy,
                           W / 2, H / 2, bg=bg, max_per_tile=256,
                           backend="pallas", **common)
    np.testing.assert_allclose(np.asarray(got["image"]), np.asarray(ref["image"]),
                               rtol=1e-4, atol=1e-4)
