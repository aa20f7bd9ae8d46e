import jax.numpy as jnp
import numpy as np
import pytest

from segsplat_tpu.ops import knn as K
from tests import oracles


def test_knn_mean_sq_dist_matches_bruteforce(rng):
    pts = rng.normal(size=(400, 3)).astype(np.float32)
    ref = oracles.oracle_knn_mean_sq(pts, k=3)
    got = np.asarray(K.knn_mean_sq_dist(jnp.asarray(pts), k=3))
    # Morton-box AABB candidate search: exact here (f32 kernel vs f64 oracle), and a
    # truncated candidate set can only miss true neighbors, never invent closer ones
    assert np.allclose(got, ref, rtol=1e-3, atol=1e-5)
    assert (got >= ref - 1e-5).all(), "box kNN must never underestimate distances"


def test_knn_clustered(rng):
    """Clustered data (the typical Gaussian-cloud case) should be near-exact."""
    centers = rng.normal(size=(8, 3)) * 10
    pts = (centers[rng.integers(0, 8, 600)] + rng.normal(size=(600, 3)) * 0.1).astype(np.float32)
    ref = oracles.oracle_knn_mean_sq(pts, k=3)
    got = np.asarray(K.knn_mean_sq_dist(jnp.asarray(pts), k=3))
    rel = np.abs(got - ref) / np.maximum(ref, 1e-9)
    assert (rel < 1e-5).mean() > 0.999


def test_initial_log_scales_shape(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    s = np.asarray(K.initial_log_scales(pts))
    assert s.shape == (100, 3)
    assert np.allclose(s[:, 0], s[:, 1])


def test_nearest_neighbor_index_exact(rng):
    refs = rng.normal(size=(300, 3)).astype(np.float32)
    queries = rng.normal(size=(101, 3)).astype(np.float32)
    got = np.asarray(K.nearest_neighbor_index(jnp.asarray(queries), jnp.asarray(refs),
                                              chunk=32))
    d2 = ((queries[:, None] - refs[None]) ** 2).sum(-1)
    ref_idx = d2.argmin(axis=1)
    # allow ties: distances must match even if index differs
    assert np.allclose(d2[np.arange(101), got], d2[np.arange(101), ref_idx], atol=1e-5)
