"""Stage-level timing of the feature-lift path at bench_lift config
(876×584 rays, ~109k voxels, 512 channels, splat m=8 K=128) on the real chip.

Decomposes the per-view budget bench.py's lift_views_per_s measures:
  bilinear 512-ch upsample → CHW→HWC transpose → splat first-hit → scatter
so views/s optimization has a per-stage scoreboard (same methodology as
perf_raster_stages.py: scan over distinct inputs, RTT subtraction)."""

from __future__ import annotations

import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from bench import officescene_lift_scene  # noqa: E402 (shared scene —
#                                            the scoreboard decomposes the
#                                            exact workload bench.py reports)
from segsplat_tpu.ops.lift import scatter_features
from segsplat_tpu.ops.lift_splat import first_hit_voxels_splat

W, H, C = 876, 584, 512
VS = 0.04
NV = 109_000
F = 8


def setup():
    sc = officescene_lift_scene(n_views=F)
    assert (sc["W"], sc["H"], sc["C"]) == (W, H, C)
    return sc["centers"], sc["ids"], sc["feats"], sc["intr"][0], sc["c2ws"]


from scripts.perf_raster_stages import measure_rtt  # noqa: E402


def timeit(name, fn, xs, consts, rtt, reps=3):
    @jax.jit
    def many(xs_, *cs):
        tot, _ = jax.lax.scan(lambda c, x: (c + fn(x, *cs), None),
                              jnp.float32(0), xs_)
        return tot

    float(many(xs, *consts))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(many(xs, *consts))
        ts.append(time.perf_counter() - t0)
    ms = (min(ts) - rtt) / F * 1e3
    print(f"{name:40s} {ms:8.2f} ms/view", flush=True)
    return ms


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          _os.path.join(_os.path.dirname(_os.path.dirname(
                              _os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    centers, ids, feats, intr, c2ws = setup()
    inc = jnp.asarray(VS * 0.5, jnp.float32)
    vsz = jnp.asarray(VS, jnp.float32)
    rtt = measure_rtt()
    print(f"devices={jax.devices()}  rtt={rtt*1e3:.1f} ms  "
          f"{W}x{H} {C}ch {NV} vox")

    # resize only
    def resize_fn(fmap, *cs):
        up = jax.image.resize(fmap.astype(jnp.float32), (C, H, W),
                              method="bilinear")
        return jnp.sum(up[:, ::64, ::64])
    timeit("resize CHW f32", resize_fn, feats, (), rtt)

    # resize + transpose
    def rt_fn(fmap, *cs):
        up = jax.image.resize(fmap.astype(jnp.float32), (C, H, W),
                              method="bilinear")
        hwc = jnp.transpose(up, (1, 2, 0))
        return jnp.sum(hwc[::64, ::64, 0])
    timeit("resize + transpose -> HWC", rt_fn, feats, (), rtt)

    # transpose-first (half-res) + HWC resize
    def tr_fn(fmap, *cs):
        hwc_half = jnp.transpose(fmap.astype(jnp.float32), (1, 2, 0))
        up = jax.image.resize(hwc_half, (H, W, C), method="bilinear")
        return jnp.sum(up[::64, ::64, 0])
    timeit("transpose(half) + resize HWC", tr_fn, feats, (), rtt)

    # splat first-hit only
    def splat_fn(c2w, centers_, ids_):
        hits = first_hit_voxels_splat(centers_, ids_, c2w, intr, vsz,
                                      0.01, 10.0, inc, W, H,
                                      max_tiles_per_axis=8, max_per_tile=128)
        return jnp.sum(hits[::64, ::64].astype(jnp.float32))
    timeit("splat first-hit [H,W]", splat_fn, c2ws, (centers, ids), rtt)

    # scatter only (use a fixed plausible hit map + resized features)
    rng = np.random.default_rng(2)
    hitmaps = jnp.asarray(
        rng.integers(0, NV + 1, size=(F, H, W)).astype(np.int32))
    fmap_full = jnp.asarray(rng.random((H, W, C)).astype(np.float32))

    def scatter_fn(hits, fmap):
        ds, dc = scatter_features(fmap, hits, NV + 1)
        return jnp.sum(ds[::64, ::64]) + jnp.sum(dc[::64].astype(jnp.float32))
    timeit("scatter segment_sum [512k x 512]", scatter_fn, hitmaps,
           (fmap_full,), rtt)

    # full per-view pipeline (bench_lift body)
    def full_fn(view, centers_, ids_):
        fmap, c2w = view
        up = jax.image.resize(fmap.astype(jnp.float32), (C, H, W),
                              method="bilinear")
        hwc = jnp.transpose(up, (1, 2, 0))
        hits = first_hit_voxels_splat(centers_, ids_, c2w, intr, vsz,
                                      0.01, 10.0, inc, W, H,
                                      max_tiles_per_axis=8, max_per_tile=128)
        ds, dc = scatter_features(hwc, hits, NV + 1)
        return jnp.sum(ds[::64, ::64]) + jnp.sum(dc[::64].astype(jnp.float32))
    timeit("FULL view (resize+splat+scatter)", full_fn, (feats, c2ws),
           (centers, ids), rtt)


if __name__ == "__main__":
    main()
