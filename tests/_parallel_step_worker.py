"""Subprocess worker for tests/test_parallel.py's meshed train-step tests.

Why a subprocess (same rationale as _parallel_train_worker.py): building a
meshed parallel train step and OTHER jitted train programs in one process
trips a jax-runtime lifted-constant/buffer-aliasing quirk on the CPU backend
("Execution supplied 47 buffers but compiled program expected 48") on a
LATER program's call — real usage builds exactly one mesh per process.
Isolating the meshed steps keeps the rest of the suite's single-view
programs unaffected.

Usage: python _parallel_step_worker.py {dp_semantics|serial_equivalence}
Prints WORKER_OK on success; any assertion failure exits nonzero.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from segsplat_tpu.core.types import stack_cameras  # noqa: E402
from segsplat_tpu.parallel.mesh import make_mesh  # noqa: E402
from segsplat_tpu.parallel.train import make_parallel_train_step  # noqa: E402
from segsplat_tpu.train.trainer import make_train_step  # noqa: E402


def _setup(rng):
    from test_parallel import _tiny_cam, _tiny_train_setup
    return _tiny_train_setup(rng), _tiny_cam


def dp_semantics():
    """One sharded multi-view step on the 4x2 mesh: finite losses, updated
    params (was test_parallel_train_step_runs_and_matches_dp_semantics)."""
    rng = np.random.default_rng(0)
    (table, cfg, state, opts), _tiny_cam = _setup(rng)
    mesh = make_mesh(n_view=4, n_tensor=2)
    raster_kw = dict(max_tiles_per_axis=4, max_per_tile=96, tile_chunk=4)
    step = make_parallel_train_step(cfg, opts, mesh, raster_kw)

    V, H, W = 4, 32, 32
    cams = stack_cameras([_tiny_cam(i, V, H, W) for i in range(V)])
    gt_img = jnp.asarray(rng.random((V, 3, H, W)), jnp.float32)
    gt_obj = jnp.asarray(rng.integers(0, 16, (V, H, W)), jnp.int32)
    bg = jnp.zeros((3,))
    rngs = jax.random.split(jax.random.PRNGKey(0), V)

    state = step.replicate(state)
    xyz_before = np.asarray(state.table.xyz).copy()   # state is donated
    cams, gt_img, gt_obj, rngs = step.place_batch(cams, gt_img, gt_obj, rngs)
    new_state, metrics = step(state, cams, gt_img, gt_obj, bg, rngs)

    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert int(new_state.step) == 1
    assert not np.allclose(np.asarray(new_state.table.xyz), xyz_before)


def serial_equivalence():
    """A 1-view batch through the parallel step (1x1 mesh) matches the serial
    step up to reduction reordering (was
    test_single_view_parallel_step_close_to_serial)."""
    rng = np.random.default_rng(0)
    (table, cfg, state, opts), _tiny_cam = _setup(rng)
    raster_kw = dict(max_tiles_per_axis=4, max_per_tile=96, tile_chunk=4)
    serial = make_train_step(cfg, opts, raster_kw)

    H = W = 32
    cam = _tiny_cam(0, 4, H, W)
    gt_img = jnp.asarray(rng.random((3, H, W)), jnp.float32)
    gt_obj = jnp.asarray(rng.integers(0, 16, (H, W)), jnp.int32)
    bg = jnp.zeros((3,))
    key = jax.random.PRNGKey(7)

    s1, m1 = serial(state, cam, gt_img, gt_obj, bg, key)

    mesh = make_mesh(n_view=1, n_tensor=1, devices=jax.devices()[:1])
    pstep = make_parallel_train_step(cfg, opts, mesh, raster_kw)
    cams = stack_cameras([cam])
    s2, m2 = pstep(state, cams, gt_img[None], gt_obj[None], bg, key[None])

    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=1e-4,
                                   atol=1e-5, err_msg=k)
    np.testing.assert_allclose(np.asarray(s1.table.xyz),
                               np.asarray(s2.table.xyz), rtol=1e-4, atol=1e-6)


if __name__ == "__main__":
    {"dp_semantics": dp_semantics,
     "serial_equivalence": serial_equivalence}[sys.argv[1]]()
    print("WORKER_OK")
