import jax.numpy as jnp
import numpy as np
import pytest

from segsplat_tpu.ops import voxelize as V


def test_voxelize_matches_numpy_unique(rng):
    pts = rng.normal(size=(500, 3)).astype(np.float32) * 2
    g = V.voxelize_points(pts, 0.25)
    # same set as the reference formulation (floor((p-min)/cell) unique)
    idx = np.floor((pts - pts.min(0)) / 0.25).astype(np.int64)
    uniq = np.unique(idx, axis=0)
    got = np.asarray(g.coords)
    assert got.shape == uniq.shape
    assert set(map(tuple, got)) == set(map(tuple, uniq))
    assert (got >= 0).all()


def test_voxelize_mean_features(rng):
    pts = np.array([[0.0, 0, 0], [0.01, 0, 0], [1.0, 1, 1]], np.float32)
    feats = np.array([[1.0], [3.0], [10.0]], np.float32)
    g = V.voxelize_points(pts, 0.5, features=feats)
    f = np.asarray(g.features).ravel()
    assert sorted(f.tolist()) == [2.0, 10.0]


def test_occupancy_roundtrip(rng):
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    g = V.voxelize_points(pts, 0.3)
    occ, origin, shape = V.occupancy_from_grid(g)
    occ = np.asarray(occ)
    coords = np.asarray(g.coords)
    # every voxel id present exactly once, 1-based, at its own coordinate
    for i, (x, y, z) in enumerate(coords):
        assert occ[z, y, x] == i + 1
    assert (np.sort(occ[occ > 0]) == np.arange(1, len(coords) + 1)).all()


def test_reduce_by_voxel_sum_and_max(rng):
    vals = rng.normal(size=(100, 4)).astype(np.float32)
    ids = rng.integers(-1, 10, 100).astype(np.int32)
    out = np.asarray(V.reduce_by_voxel(jnp.asarray(vals), jnp.asarray(ids), 10, "sum"))
    for v in range(10):
        ref = vals[ids == v].sum(axis=0) if (ids == v).any() else np.zeros(4)
        assert np.allclose(out[v], ref, atol=1e-5)
    cnt = np.asarray(V.count_by_voxel(jnp.asarray(ids), 10))
    assert np.array_equal(cnt, [(ids == v).sum() for v in range(10)])


def test_pack_unpack_coords(rng):
    coords = rng.integers(0, 50, (64, 3)).astype(np.int32)
    keys = V.pack_coords(jnp.asarray(coords), (50, 60))
    back = np.asarray(V.unpack_key(keys, (50, 60)))
    assert np.array_equal(back, coords)


def test_unique_voxels_jit(rng):
    coords = rng.integers(0, 4, (100, 3)).astype(np.int32)
    uniq, inverse, n = V.unique_voxels_jit(jnp.asarray(coords), capacity=100,
                                           shape_xyz=(4, 4))
    uniq, inverse, n = np.asarray(uniq), np.asarray(inverse), int(n)
    ref = np.unique(coords.astype(np.int64) @ np.array([1, 4, 16]), )
    assert n == len(ref)
    assert np.array_equal(np.sort(uniq[:n]), ref)
    # inverse maps each sample to its unique key
    keys = coords.astype(np.int64) @ np.array([1, 4, 16])
    assert np.array_equal(uniq[inverse], keys)
