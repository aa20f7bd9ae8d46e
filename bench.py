"""Benchmark: semantic novel-view render FPS @ 1080p on one TPU chip.

The reference's FPS-metric path is gsplat 32-channel logit rasterization per view
(voxel_to_gaussian/render_semantics_logits.py:92-105) on a CUDA GPU; the north-star
target is >=30 FPS at 1080p on one v5e chip (BASELINE.md). The reference publishes
no numbers (BASELINE.json published: {}), so vs_baseline is measured against that
30-FPS target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from segsplat_tpu.core.types import Camera
    from segsplat_tpu.ops.rasterize import rasterize

    W, H = 1920, 1080
    N = 200_000           # typical trained-scene Gaussian count
    rng = np.random.default_rng(0)

    # synthetic trained-scene stand-in: Gaussians in a 4m box in front of the camera
    xyz = jnp.asarray(rng.random((N, 3)) * np.array([4.0, 3.0, 4.0])
                      + np.array([-2.0, -1.5, 2.0]), jnp.float32)
    scales = jnp.asarray(np.exp(rng.normal(-4.6, 0.3, (N, 3))), jnp.float32)
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    quats = jnp.asarray(quats)
    opac = jnp.asarray(rng.uniform(0.3, 0.95, (N,)), jnp.float32)
    logits = jnp.asarray(rng.standard_normal((N, 32)), jnp.float32)

    cam = Camera(R=jnp.eye(3), T=jnp.zeros(3),
                 fov_x=jnp.asarray(1.2), fov_y=jnp.asarray(0.75),
                 width=W, height=H)
    viewmat = cam.world_view_transform()
    K = cam.intrinsics()
    bg = jnp.zeros((32,), jnp.float32)

    # max_tiles_per_axis=3 covers this scene's splat radii exactly (~11 px → ≤3
    # tiles); the Pallas backend is the fused TPU blend kernel
    kw = dict(width=W, height=H, max_tiles_per_axis=3, max_per_tile=256,
              backend="pallas")

    # measurement note: through the remote TPU tunnel, block_until_ready does not
    # reliably wait for execution, so F frames run inside ONE jitted lax.scan with
    # distinct viewmats and the (host-transferred) scalar result forces full sync;
    # the measured tunnel RTT is subtracted.
    def one_frame(vm):
        out = rasterize(xyz, scales, quats, opac, logits, vm,
                        K[0, 0], K[1, 1], K[0, 2], K[1, 2], bg=bg, **kw)
        return jnp.sum(jnp.argmax(out["image"], axis=-1).astype(jnp.int32))

    @jax.jit
    def many(vms):
        tot, _ = jax.lax.scan(lambda c, vm: (c + one_frame(vm), None),
                              jnp.int32(0), vms)
        return tot

    def vm_of(a):
        R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                      [-np.sin(a), 0, np.cos(a)]], np.float32)
        c = Camera(R=jnp.asarray(R), T=jnp.zeros(3),
                   fov_x=jnp.asarray(1.2), fov_y=jnp.asarray(0.75),
                   width=W, height=H)
        return c.world_view_transform()

    tiny = jax.jit(lambda x: x + 1)
    float(jnp.sum(tiny(jnp.ones((8, 8)))))
    t0 = time.perf_counter()
    float(jnp.sum(tiny(jnp.ones((8, 8)))))
    rtt = time.perf_counter() - t0

    frames = 16
    vms = jnp.stack([vm_of(0.002 * i) for i in range(frames)])
    float(many(vms))  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(vms))
        times.append(time.perf_counter() - t0)
    per_frame = (min(times) - rtt) / frames
    fps = 1.0 / per_frame

    print(json.dumps({
        "metric": "semantic_render_fps_1080p_200k",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
