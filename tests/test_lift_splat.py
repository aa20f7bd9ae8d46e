"""Splat-formulated first hit vs the DDA reference implementation."""

import numpy as np
import jax.numpy as jnp
import pytest

from segsplat_tpu.ops.lift import default_max_steps, first_hit_voxels
from segsplat_tpu.ops.lift_splat import first_hit_voxels_splat


def _scene(rng, Z=10, Y=8, X=12, fill=0.06):
    occ = np.zeros((Z, Y, X), np.int32)
    mask = rng.random((Z, Y, X)) < fill
    mask[0, :, :] = True  # a solid back wall
    ids = np.cumsum(mask.ravel()).reshape(Z, Y, X)
    occ[mask] = ids[mask]
    return occ


def _cam(i, n):
    ang = 2 * np.pi * i / max(n, 1)
    pos = np.array([2.5 * np.sin(ang), 0.3, -2.5 * np.cos(ang)])
    fwd = -pos / np.linalg.norm(pos)
    right = np.cross([0.0, 1.0, 0.0], fwd)
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, fwd, pos
    return c2w


@pytest.mark.parametrize("view", [0, 1, 2])
def test_splat_matches_dda(rng, view):
    occ = _scene(rng)
    Z, Y, X = occ.shape
    vs = 0.22
    origin = np.array([-1.3, -0.9, -1.1], np.float32)
    W, H = 48, 40
    fx = fy = 45.0
    intr = jnp.asarray([fx, fy, W / 2, H / 2], jnp.float32)
    c2w = jnp.asarray(_cam(view, 3))
    inc = vs * 0.5
    steps = default_max_steps(W, H, fx, fy, 0.05, 8.0, inc)

    dda = np.asarray(first_hit_voxels(
        jnp.asarray(occ), c2w, intr, jnp.asarray(origin),
        jnp.asarray(vs, jnp.float32), 0.05, 8.0,
        jnp.asarray(inc, jnp.float32), W, H, steps))

    coords = np.argwhere(occ > 0)                       # [V,3] (z,y,x)
    ids = occ[coords[:, 0], coords[:, 1], coords[:, 2]]
    centers = coords[:, ::-1].astype(np.float32) * vs + origin  # (x,y,z)

    splat = np.asarray(first_hit_voxels_splat(
        jnp.asarray(centers), jnp.asarray(ids.astype(np.int32)), c2w, intr,
        jnp.asarray(vs, jnp.float32), 0.05, 8.0, jnp.asarray(inc, jnp.float32),
        W, H, max_tiles_per_axis=4, max_per_tile=64, tile_chunk=4))

    assert (dda > 0).sum() > 0.3 * dda.size, "scene must be mostly covered"
    agree = (dda == splat).mean()
    # fp boundary cases (grazing rays, cube-face hits) may differ; require
    # near-exact agreement
    assert agree > 0.97, f"only {agree:.3f} agreement"


def test_fused_lift_matches_hits_plus_scatter(rng):
    """lift_view_splat (tile-level MXU one-hot accumulation) must equal
    first_hit_voxels_splat + scatter_features up to f32 associativity."""
    from segsplat_tpu.ops.lift import scatter_features
    from segsplat_tpu.ops.lift_splat import lift_view_splat

    occ = _scene(rng)
    vs = 0.22
    origin = np.array([-1.3, -0.9, -1.1], np.float32)
    W, H, C = 48, 40, 24
    fx = fy = 45.0
    intr = jnp.asarray([fx, fy, W / 2, H / 2], jnp.float32)
    c2w = jnp.asarray(_cam(1, 3))
    inc = vs * 0.5

    coords = np.argwhere(occ > 0)
    ids = occ[coords[:, 0], coords[:, 1], coords[:, 2]].astype(np.int32)
    centers = coords[:, ::-1].astype(np.float32) * vs + origin
    num_ids = int(ids.max()) + 1
    feats = jnp.asarray(rng.random((H, W, C)).astype(np.float32))

    kw = dict(max_tiles_per_axis=4, max_per_tile=64, tile_chunk=4)
    hits = first_hit_voxels_splat(
        jnp.asarray(centers), jnp.asarray(ids), c2w, intr,
        jnp.asarray(vs, jnp.float32), 0.05, 8.0,
        jnp.asarray(inc, jnp.float32), W, H, **kw)
    ref_sums, ref_counts = scatter_features(feats, hits, num_ids)

    sums, counts, overflow = lift_view_splat(
        jnp.asarray(centers), jnp.asarray(ids), c2w, intr,
        jnp.asarray(vs, jnp.float32), 0.05, 8.0,
        jnp.asarray(inc, jnp.float32), feats, num_ids, W, H, **kw)

    assert int(overflow) == 0
    np.testing.assert_array_equal(np.asarray(counts), np.asarray(ref_counts))
    np.testing.assert_allclose(np.asarray(sums), np.asarray(ref_sums),
                               rtol=1e-5, atol=1e-5)
    assert int(np.asarray(counts).sum()) > 0


@pytest.mark.parametrize("view", [0, 2])
def test_dual_bin_matches_single(rng, view):
    """Dual-class binning (m_small=2 + selected big set) must reproduce the
    single-pass m×m binning exactly, including close-up cameras with
    multi-tile voxel footprints."""
    occ = _scene(rng)
    vs = 0.22
    origin = np.array([-1.3, -0.9, -1.1], np.float32)
    W, H = 64, 48
    fx = fy = 70.0          # bigger focal → near voxels span several tiles
    intr = jnp.asarray([fx, fy, W / 2, H / 2], jnp.float32)
    c2w = jnp.asarray(_cam(view, 3))
    # pull the camera in closer to force big footprints
    c2w = c2w.at[:3, 3].multiply(0.6)
    inc = vs * 0.5

    coords = np.argwhere(occ > 0)
    ids = occ[coords[:, 0], coords[:, 1], coords[:, 2]].astype(np.int32)
    centers = coords[:, ::-1].astype(np.float32) * vs + origin

    kw = dict(max_tiles_per_axis=6, max_per_tile=128, tile_chunk=4)
    args = (jnp.asarray(centers), jnp.asarray(ids), c2w, intr,
            jnp.asarray(vs, jnp.float32), 0.05, 8.0,
            jnp.asarray(inc, jnp.float32), W, H)
    single = np.asarray(first_hit_voxels_splat(*args, dual_bin=False, **kw))
    dual = np.asarray(first_hit_voxels_splat(*args, dual_bin=True,
                                             big_budget=len(ids) // 2, **kw))
    assert (single > 0).sum() > 100
    np.testing.assert_array_equal(dual, single)


def test_dual_bin_fused_sums_match(rng):
    """Fused lift with dual binning == fused lift with single-pass binning
    (no pair may be emitted twice — double emission would double-count)."""
    from segsplat_tpu.ops.lift_splat import lift_view_splat

    occ = _scene(rng)
    vs = 0.22
    origin = np.array([-1.3, -0.9, -1.1], np.float32)
    W, H, C = 48, 40, 16
    intr = jnp.asarray([45.0, 45.0, W / 2, H / 2], jnp.float32)
    c2w = jnp.asarray(_cam(0, 3))
    inc = vs * 0.5
    coords = np.argwhere(occ > 0)
    ids = occ[coords[:, 0], coords[:, 1], coords[:, 2]].astype(np.int32)
    centers = coords[:, ::-1].astype(np.float32) * vs + origin
    num_ids = int(ids.max()) + 1
    feats = jnp.asarray(rng.random((H, W, C)).astype(np.float32))

    kw = dict(max_tiles_per_axis=4, max_per_tile=64, tile_chunk=4)
    args = (jnp.asarray(centers), jnp.asarray(ids), c2w, intr,
            jnp.asarray(vs, jnp.float32), 0.05, 8.0,
            jnp.asarray(inc, jnp.float32), feats, num_ids, W, H)
    s1, c1, of1 = lift_view_splat(*args, dual_bin=False, **kw)
    s2, c2, of2 = lift_view_splat(*args, dual_bin=True, **kw)
    assert int(of1) == 0 and int(of2) == 0
    np.testing.assert_array_equal(np.asarray(c2), np.asarray(c1))
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1),
                               rtol=1e-6, atol=1e-6)
