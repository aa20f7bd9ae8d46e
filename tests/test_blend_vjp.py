"""Analytic Pallas blend backward vs XLA autodiff of the dense blend."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from segsplat_tpu.ops import rasterize as Rz


def _scene(rng, n=400):
    xyz = (rng.random((n, 3)) * np.array([3.0, 2.0, 2.0])
           + np.array([-1.5, -1.0, 1.5])).astype(np.float32)
    scales = np.exp(rng.normal(-2.5, 0.3, (n, 3))).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    opac = rng.uniform(0.3, 0.9, (n,)).astype(np.float32)
    colors = rng.random((n, 8)).astype(np.float32)
    return (jnp.asarray(xyz), jnp.asarray(scales), jnp.asarray(q),
            jnp.asarray(opac), jnp.asarray(colors))


def test_pallas_vjp_matches_xla_grads(rng):
    xyz, scales, quats, opac, colors = _scene(rng)
    W, H = 64, 48
    fx = fy = 60.0
    vm = jnp.eye(4)
    bg = jnp.asarray(rng.random(8), jnp.float32)
    gt = jnp.asarray(rng.random((H, W, 8)), jnp.float32)
    common = dict(width=W, height=H, max_tiles_per_axis=4, max_per_tile=128)
    offset = jnp.zeros((xyz.shape[0], 2))

    def loss(backend, xyz, scales, quats, opac, colors, offset, bg):
        out = Rz.rasterize(xyz, scales, quats, opac, colors, vm, fx, fy,
                           W / 2, H / 2, bg=bg, means2d_offset=offset,
                           tile_chunk=4, backend=backend, **common)
        return jnp.sum((out["image"] - gt) ** 2) + 0.3 * jnp.sum(out["alpha"] ** 2)

    argnums = (0, 1, 2, 3, 4, 5, 6)
    ref_l, ref_g = jax.value_and_grad(
        lambda *a: loss("xla", *a), argnums=argnums)(
        xyz, scales, quats, opac, colors, offset, bg)
    with pltpu.force_tpu_interpret_mode():
        got_l, got_g = jax.value_and_grad(
            lambda *a: loss("pallas", *a), argnums=argnums)(
            xyz, scales, quats, opac, colors, offset, bg)

    np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-4)
    names = ("xyz", "scales", "quats", "opac", "colors", "means2d_offset", "bg")
    for name, r, g in zip(names, ref_g, got_g):
        r, g = np.asarray(r), np.asarray(g)
        denom = np.abs(r).max() + 1e-6
        np.testing.assert_allclose(g, r, rtol=5e-3, atol=2e-4 * denom,
                                   err_msg=f"grad mismatch: {name}")
        assert np.abs(g).max() > 0, f"grad identically zero: {name}"
