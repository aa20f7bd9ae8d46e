"""Unified-Lift train-step timing at officescene scale on the real chip.

Round-1 anchor: 193 ms/step (BASELINE.md). Methodology as everywhere: steps
run inside one jitted lax.scan over distinct views, scalar host transfer
forces sync, tunnel RTT subtracted via two scan lengths (rtt cancels in the
difference)."""

from __future__ import annotations

import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          _os.path.join(_os.path.dirname(_os.path.dirname(
                              _os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from segsplat_tpu.core.types import Camera
    from segsplat_tpu.train.trainer import (OptimizationConfig, init_state,
                                            init_table_from_pcd,
                                            make_optimizer, make_train_step)
    import optax

    W, H = 876, 584
    CAP = 262_144
    N = 200_000
    rng = np.random.default_rng(0)
    pts = (rng.random((N, 3)) * np.array([4.0, 3.0, 4.0])
           + np.array([-2.0, -1.5, 2.0])).astype(np.float32)
    cols = rng.random((N, 3)).astype(np.float32)
    table = init_table_from_pcd(pts, cols, CAP, max_sh_degree=3)

    cfg = OptimizationConfig(num_classes=256)
    gauss_opt = make_optimizer(cfg, spatial_lr_scale=3.0)
    cls_opt = optax.adam(cfg.codebook_lr)
    raster_kw = dict(max_tiles_per_axis=3, max_per_tile=256,
                     backend="pallas")
    state, _ = init_state(table, cfg, spatial_lr_scale=3.0, seed=0,
                          optimizers=(gauss_opt, cls_opt))
    step = make_train_step(cfg, (gauss_opt, cls_opt), raster_kw)

    def cam_of(a):
        Rm = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                       [-np.sin(a), 0, np.cos(a)]], np.float32)
        return Camera(R=jnp.asarray(Rm), T=jnp.zeros(3),
                      fov_x=jnp.asarray(1.2), fov_y=jnp.asarray(0.75),
                      width=W, height=H)

    gt = jnp.asarray(rng.random((3, H, W)).astype(np.float32))
    gto = jnp.asarray(rng.integers(0, 32, (H, W)).astype(np.int32))
    bg = jnp.zeros((3,))

    F1, F2 = 2, 6

    def make(F):
        cams = [cam_of(0.01 * i) for i in range(F)]
        import segsplat_tpu.core.types as T
        cams_b = T.stack_cameras(cams)
        keys = jax.random.split(jax.random.PRNGKey(0), F)

        @jax.jit
        def many(state):
            def body(s, xs):
                cam_i, key = xs
                s2, m = step(s, cam_i, gt, gto, bg, key)
                return s2, m["total"]
            s, tot = jax.lax.scan(body, state, (cams_b, keys))
            return jnp.sum(tot)
        return many

    m1, m2 = make(F1), make(F2)
    print("compiling...", flush=True)
    t0 = time.perf_counter()
    float(m1(state)); float(m2(state))
    print(f"compiled in {time.perf_counter()-t0:.0f}s", flush=True)
    t1s, t2s = [], []
    for _ in range(4):
        t0 = time.perf_counter(); float(m1(state)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(m2(state)); t2s.append(time.perf_counter() - t0)
    ms = (min(t2s) - min(t1s)) / (F2 - F1) * 1e3
    print(f"train step ({W}x{H}, cap {CAP}, pallas): {ms:.1f} ms/step "
          f"= {1000/ms:.2f} it/s")


if __name__ == "__main__":
    main()
