import jax.numpy as jnp
import numpy as np
import pytest

from segsplat_tpu.ops import lift as L
from tests import oracles


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(3)
    return oracles.make_test_scene(rng)


def test_first_hit_matches_cuda_oracle(scene):
    occ, c2w, intr, origin, vs, W, H = scene
    step = vs * 0.5
    dmin, dmax = 0.01, 3.0
    ref = oracles.oracle_first_hit(occ, c2w, intr, origin, vs, dmin, dmax, step, W, H)
    max_steps = L.default_max_steps(W, H, intr[0], intr[1], dmin, dmax, step)
    got = np.asarray(L.first_hit_voxels(
        jnp.asarray(occ), jnp.asarray(c2w), jnp.asarray(intr), jnp.asarray(origin),
        jnp.asarray(vs), dmin, dmax, jnp.asarray(step, jnp.float32), W, H, max_steps))
    assert (ref > 0).sum() > 20, "test scene should produce hits"
    match = (got == ref).mean()
    assert match > 0.995, f"only {match:.3%} of pixels match oracle"


def test_scatter_matches_oracle(scene, rng):
    occ, c2w, intr, origin, vs, W, H = scene
    num_ids = int(occ.max()) + 1
    hits = oracles.oracle_first_hit(occ, c2w, intr, origin, vs, 0.01, 3.0, vs / 2, W, H)
    feats = rng.normal(size=(H, W, 8)).astype(np.float32)
    ref_s, ref_c = oracles.oracle_scatter(feats, hits, num_ids)
    got_s, got_c = L.scatter_features(jnp.asarray(feats), jnp.asarray(hits), num_ids)
    assert np.array_equal(np.asarray(got_c), ref_c)
    assert np.allclose(np.asarray(got_s), ref_s, atol=1e-4)


def test_lift_view_end_to_end(scene, rng):
    occ, c2w, intr, origin, vs, W, H = scene
    num_ids = int(occ.max()) + 1
    feats = rng.normal(size=(H, W, 8)).astype(np.float32)
    sums, counts = L.lift_view(feats, occ, c2w, intr, origin, vs, num_ids,
                               depth_max=3.0)
    hits = oracles.oracle_first_hit(occ, c2w, intr, origin, vs, 0.01, 3.0, vs / 2, W, H)
    ref_s, ref_c = oracles.oracle_scatter(feats, hits, num_ids)
    # tolerance: boundary-step pixels may differ; bulk must agree
    agree = np.array_equal(np.asarray(counts), ref_c)
    if not agree:
        diff = np.abs(np.asarray(counts) - ref_c).sum()
        assert diff <= max(2, 0.01 * ref_c.sum()), "hit counts diverge from oracle"
    avg = np.asarray(L.mean_features(sums, counts))
    assert np.isfinite(avg).all()


def test_lift_views_scan_accumulates(scene, rng):
    occ, c2w, intr, origin, vs, W, H = scene
    num_ids = int(occ.max()) + 1
    V = 3
    feats = rng.normal(size=(V, H, W, 8)).astype(np.float32)
    c2ws = np.tile(c2w, (V, 1, 1)).astype(np.float32)
    # offset the cameras slightly
    c2ws[1, 0, 3] += 0.05
    c2ws[2, 1, 3] -= 0.05
    intrs = np.tile(intr, (V, 1)).astype(np.float32)
    step = np.float32(vs / 2)
    max_steps = L.default_max_steps(W, H, intr[0], intr[1], 0.01, 3.0, step)
    sums, counts = L.lift_views_scan(
        jnp.asarray(feats), jnp.asarray(occ), jnp.asarray(c2ws), jnp.asarray(intrs),
        jnp.asarray(origin), jnp.asarray(vs), 0.01, 3.0, jnp.asarray(step),
        num_ids, max_steps, W, H)
    # must equal the sum of single-view lifts
    s_ref = np.zeros_like(np.asarray(sums))
    c_ref = np.zeros_like(np.asarray(counts))
    for v in range(V):
        s, c = L.lift_view(feats[v], occ, c2ws[v], intrs[v], origin, vs, num_ids,
                           depth_max=3.0)
        s_ref += np.asarray(s)
        c_ref += np.asarray(c)
    assert np.array_equal(np.asarray(counts), c_ref)
    assert np.allclose(np.asarray(sums), s_ref, atol=1e-4)


def test_deterministic_accumulation(scene, rng):
    """segment_sum replaces atomicAdd: results must be bit-identical across runs."""
    occ, c2w, intr, origin, vs, W, H = scene
    num_ids = int(occ.max()) + 1
    feats = rng.normal(size=(H, W, 16)).astype(np.float32)
    a = np.asarray(L.lift_view(feats, occ, c2w, intr, origin, vs, num_ids, depth_max=3.0)[0])
    b = np.asarray(L.lift_view(feats, occ, c2w, intr, origin, vs, num_ids, depth_max=3.0)[0])
    assert np.array_equal(a, b)
