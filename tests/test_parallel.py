"""Multi-chip sharding tests on the 8-virtual-CPU-device mesh (conftest.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segsplat_tpu.core.types import Camera, GaussianTable, stack_cameras
from segsplat_tpu.ops.lift import default_max_steps, lift_views_scan
from segsplat_tpu.parallel import (lift_views_sharded, make_mesh,
                                   make_parallel_train_step)
from segsplat_tpu.train.trainer import (OptimizationConfig, init_state,
                                        init_table_from_pcd, make_train_step)


def _make_views(rng, V, H, W, C):
    """V inward-looking cameras around a small voxel cluster at the origin."""
    feats = rng.random((V, H, W, C)).astype(np.float32)
    c2ws, intr = [], []
    fx = fy = 40.0
    for i in range(V):
        ang = 2 * np.pi * i / V
        pos = np.array([2.5 * np.sin(ang), 0.0, 2.5 * np.cos(ang) * -1.0])
        # look-at origin
        fwd = -pos / np.linalg.norm(pos)
        right = np.cross(np.array([0.0, 1.0, 0.0]), fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, fwd, pos
        c2ws.append(c2w)
        intr.append([fx, fy, W / 2, H / 2])
    return (jnp.asarray(feats), jnp.asarray(np.stack(c2ws)),
            jnp.asarray(np.array(intr, np.float32)))


def test_lift_views_sharded_matches_single_device(rng):
    V, H, W, C = 8, 24, 32, 16
    Z = Y = X = 8
    occ = np.zeros((Z, Y, X), np.int32)
    ids = np.arange(1, 1 + Z * Y * X).reshape(Z, Y, X)
    occ[2:6, 2:6, 2:6] = ids[2:6, 2:6, 2:6]
    num_ids = int(occ.max()) + 1
    vs = 0.25
    origin = np.array([-1.0, -1.0, -1.0], np.float32)

    feats, c2ws, intr = _make_views(rng, V, H, W, C)
    inc = vs * 0.5
    steps = default_max_steps(W, H, 40.0, 40.0, 0.5, 6.0, inc)

    ref_sums, ref_counts = lift_views_scan(
        feats, jnp.asarray(occ), c2ws, intr, jnp.asarray(origin),
        jnp.asarray(vs, jnp.float32), 0.5, 6.0, jnp.asarray(inc, jnp.float32),
        num_ids, steps, W, H)

    mesh = make_mesh(n_view=4, n_tensor=2)
    sums, counts = lift_views_sharded(
        mesh, feats, jnp.asarray(occ), c2ws, intr, jnp.asarray(origin),
        jnp.asarray(vs, jnp.float32), 0.5, 6.0, inc, num_ids, steps)

    assert int(np.asarray(ref_counts).sum()) > 0, "test scene must produce hits"
    np.testing.assert_array_equal(np.asarray(counts), np.asarray(ref_counts))
    np.testing.assert_allclose(np.asarray(sums), np.asarray(ref_sums),
                               rtol=1e-5, atol=1e-5)


def _tiny_train_setup(rng, n=64, capacity=96):
    pts = (rng.random((n, 3)) * 2 - 1).astype(np.float32)
    cols = rng.random((n, 3)).astype(np.float32)
    table = init_table_from_pcd(pts, cols, capacity, max_sh_degree=1)
    cfg = OptimizationConfig(num_classes=16)
    state, opts = init_state(table, cfg, spatial_lr_scale=1.0)
    return table, cfg, state, opts


def _tiny_cam(i, V, H=32, W=32):
    ang = 2 * np.pi * i / V
    pos = np.array([3 * np.sin(ang), 0.0, -3 * np.cos(ang)])
    fwd = -pos / np.linalg.norm(pos)
    right = np.cross(np.array([0.0, 1.0, 0.0]), fwd)
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    R = np.stack([right, up, fwd], axis=1).astype(np.float32)  # c2w rotation
    T = (-R.T @ pos).astype(np.float32)
    return Camera(R=jnp.asarray(R), T=jnp.asarray(T),
                  fov_x=jnp.asarray(0.8), fov_y=jnp.asarray(0.8),
                  width=W, height=H)


def _run_step_worker(mode: str):
    """Meshed train-step tests run in a SUBPROCESS: building a meshed
    parallel step alongside the suite's other jitted train programs trips
    the CPU-backend lifted-constant/buffer-aliasing quirk ("supplied 47
    buffers, expected 48") on a later program's call — see
    _parallel_step_worker.py (same rationale as _parallel_train_worker)."""
    import os
    import subprocess
    import sys

    worker = os.path.join(os.path.dirname(__file__),
                          "_parallel_step_worker.py")
    r = subprocess.run([sys.executable, worker, mode], capture_output=True,
                       text=True, timeout=600,
                       cwd=os.path.dirname(__file__))
    assert r.returncode == 0 and "WORKER_OK" in r.stdout, (
        f"{mode} worker failed\nstdout:{r.stdout}\nstderr:{r.stderr[-2000:]}")


def test_parallel_train_step_runs_and_matches_dp_semantics():
    """One sharded multi-view step on the 4x2 mesh: finite losses + updated
    params (body in _parallel_step_worker.dp_semantics)."""
    _run_step_worker("dp_semantics")


def test_single_view_parallel_step_close_to_serial():
    """1-view batch through the parallel step (1x1 mesh) == serial step up to
    reduction reordering (body in _parallel_step_worker.serial_equivalence)."""
    _run_step_worker("serial_equivalence")


def test_rasterize_sharded_matches_single_device(rng):
    """Image-strip sharded rendering must match the single-device render
    row-for-row."""
    import jax
    from segsplat_tpu.ops.rasterize import rasterize
    from segsplat_tpu.parallel.mesh import make_mesh
    from segsplat_tpu.parallel.render import rasterize_sharded

    n = 400
    xyz = jnp.asarray((rng.random((n, 3)) * np.array([3, 2, 2])
                       + np.array([-1.5, -1, 1.5])), jnp.float32)
    scales = jnp.asarray(np.exp(rng.normal(-2.5, 0.3, (n, 3))), jnp.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    quats = jnp.asarray(q)
    opac = jnp.asarray(rng.uniform(0.3, 0.95, (n,)), jnp.float32)
    colors = jnp.asarray(rng.random((n, 8)), jnp.float32)
    W, H = 64, 64
    fx = fy = 60.0
    vm = jnp.eye(4)
    bg = jnp.asarray(rng.random(8), jnp.float32)

    ref = rasterize(xyz, scales, quats, opac, colors, vm, fx, fy, W / 2, H / 2,
                    W, H, bg=bg, max_tiles_per_axis=4, max_per_tile=96,
                    tile_chunk=4)
    mesh = make_mesh(n_view=4, n_tensor=1, devices=jax.devices()[:4])
    got = rasterize_sharded(mesh, xyz, scales, quats, opac, colors, vm,
                            fx, fy, W / 2, H / 2, W, H, bg=bg,
                            max_tiles_per_axis=4, max_per_tile=96, tile_chunk=4)
    np.testing.assert_allclose(np.asarray(got["image"]),
                               np.asarray(ref["image"]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["alpha"]),
                               np.asarray(ref["alpha"]), rtol=1e-5, atol=1e-5)
