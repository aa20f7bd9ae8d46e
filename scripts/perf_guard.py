#!/usr/bin/env python
"""Tunnel-independent perf guard: deterministic CPU proxies for the three
bench.py configs (headline render, hostile render, officescene lift chunk).

Two straight rounds produced zero TPU perf signal because the axon tunnel
relay died (BENCH_r03/BENCH_r04 = 0.0); this guard bounds perf drift BETWEEN
TPU windows so a raster/lift change always carries a measurable delta:

  * compiled-HLO counts — flops, bytes accessed, peak temp memory — from
    ``jax.jit(fn).lower(*args).compile().cost_analysis()`` on the CPU
    backend. Deterministic: any change means the compiled program changed.
  * fixed-seed single-core wall-clock of the same compiled programs
    (skippable with --no-walltime when the core is busy; tolerance ±25% —
    the box has ONE core and timing is contention-noisy).

The scenes are imported from bench.py itself (headline_render_scene,
hostile_render_scene, officescene_lift_scene) so the guard tracks EXACTLY
the benched shapes. One deliberate divergence: the render programs compile
with backend="xla" because the Pallas blend kernel is Mosaic/TPU-only — the
guard covers everything around the kernel swap (projection, binning, sort,
gathers, per-tile layout) which is where every regression since round 2
actually landed (m=3→6 default, pair caps, memoized programs).

Usage:
  python scripts/perf_guard.py                      # measure, print JSON
  python scripts/perf_guard.py --out results/perf_guard_r5.json
  python scripts/perf_guard.py --compare results/perf_guard_r5.json
  python scripts/perf_guard.py --no-walltime        # counts only

Tracks the reference FPS path (render_semantics_logits.py:92-105) and lift
path (aggregate_voxel_features_onthefly.py:170-315) without the chip.
"""

from __future__ import annotations

import json
import os
import sys
import time
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WALL_TOLERANCE = 0.25   # single-core CPU; anything beyond this is a signal
COUNT_TOLERANCE = 0.01  # compiled-program counts should be ~exact


def _render_program(scene):
    import jax.numpy as jnp

    from segsplat_tpu.core.types import Camera
    from segsplat_tpu.ops.rasterize import rasterize

    W, H = scene["W"], scene["H"]
    kw = dict(scene["kw"])
    kw["backend"] = "xla"  # Pallas blend is Mosaic/TPU-only (see module doc)
    cam = Camera(R=jnp.eye(3), T=jnp.zeros(3),
                 fov_x=jnp.asarray(1.2), fov_y=jnp.asarray(0.75),
                 width=W, height=H)
    K = cam.intrinsics()
    bg = jnp.zeros((32,), jnp.float32)

    def one_frame(xyz, scales, quats, opac, logits, vm):
        out = rasterize(xyz, scales, quats, opac, logits, vm,
                        K[0, 0], K[1, 1], K[0, 2], K[1, 2], bg=bg, **kw)
        return jnp.sum(jnp.argmax(out["image"], axis=-1).astype(jnp.int32))

    args = (scene["xyz"], scene["scales"], scene["quats"], scene["opac"],
            scene["logits"], cam.world_view_transform())
    return one_frame, args, 1


def _lift_program(scene):
    import jax
    import jax.numpy as jnp

    from segsplat_tpu.ops.lift_splat import lift_view_splat

    W, H, C, vs = scene["W"], scene["H"], scene["C"], scene["vs"]
    num_ids = scene["centers"].shape[0] + 1
    inc = jnp.asarray(vs * 0.5, jnp.float32)

    def lift_all(feats, c2ws, intr, centers, ids):
        def one(carry, view):
            s, c = carry
            fmap, c2w, K = view
            fmap = jax.image.resize(fmap.astype(jnp.float32), (C, H, W),
                                    method="bilinear")
            fmap = jnp.transpose(fmap, (1, 2, 0))
            ds, dc, _of = lift_view_splat(
                centers, ids, c2w, K, jnp.asarray(vs, jnp.float32),
                0.01, 10.0, inc, fmap, num_ids, W, H,
                max_tiles_per_axis=8, max_per_tile=128)
            return (s + ds, c + dc), None

        init = (jnp.zeros((num_ids, C), jnp.float32),
                jnp.zeros((num_ids,), jnp.int32))
        (s, c), _ = jax.lax.scan(one, init, (feats, c2ws, intr))
        return jnp.sum(s[::64, ::64]) + jnp.sum(c[::64])

    args = (scene["feats"], scene["c2ws"], scene["intr"],
            scene["centers"], scene["ids"])
    return lift_all, args, int(scene["feats"].shape[0])


def measure(walltime: bool = True) -> dict:
    import jax

    import bench

    programs = {
        "headline_render_1080p_200k_xla":
            _render_program(bench.headline_render_scene()),
        "hostile_render_1080p_200k_xla":
            _render_program(bench.hostile_render_scene()),
        "lift_officescene_8views":
            _lift_program(bench.officescene_lift_scene(n_views=8)),
    }
    out = {"platform": jax.default_backend(),
           "jax_version": jax.__version__}
    for name, (fn, args, units) in programs.items():
        compiled = jax.jit(fn).lower(*args).compile()
        row: dict = {"units_per_call": units}
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            row["flops"] = float(ca.get("flops", -1.0))
            row["transcendentals"] = float(ca.get("transcendentals", -1.0))
            row["bytes_accessed"] = float(ca.get("bytes accessed", -1.0))
        except Exception as e:  # pragma: no cover - backend-dependent
            row["cost_analysis_error"] = str(e)[:120]
        try:
            ma = compiled.memory_analysis()
            row["temp_bytes"] = int(ma.temp_size_in_bytes)
            row["output_bytes"] = int(ma.output_size_in_bytes)
        except Exception as e:  # pragma: no cover - backend-dependent
            row["memory_analysis_error"] = str(e)[:120]
        if walltime:
            r = compiled(*args)
            jax.block_until_ready(r)  # warm (allocs, thunk init)
            times = []
            for _ in range(2):
                t0 = time.perf_counter()
                jax.block_until_ready(compiled(*args))
                times.append(time.perf_counter() - t0)
            row["wall_s_per_unit"] = round(min(times) / units, 4)
        out[name] = row
    return out


def compare(baseline: dict, current: dict) -> int:
    """Print per-config deltas; return the number of out-of-tolerance rows."""
    bad = 0
    for name, base in baseline.items():
        if not isinstance(base, dict) or name not in current:
            continue
        cur = current[name]
        for key, tol in (("flops", COUNT_TOLERANCE),
                         ("bytes_accessed", COUNT_TOLERANCE),
                         ("temp_bytes", COUNT_TOLERANCE),
                         ("wall_s_per_unit", WALL_TOLERANCE)):
            if key not in base or key not in cur:
                continue
            b, c = float(base[key]), float(cur[key])
            if b <= 0:
                continue
            rel = (c - b) / b
            flag = "OK" if abs(rel) <= tol else "DRIFT"
            if flag == "DRIFT":
                bad += 1
            print(f"{flag:5s} {name}.{key}: {b:.4g} -> {c:.4g} "
                  f"({rel:+.1%}, tol ±{tol:.0%})")
    return bad


def main(argv=None):
    import jax
    # the guard is the CPU proxy BY DESIGN — never touch the (possibly
    # wedged) tunnel backend; jax is preimported on axon, so config, not env
    jax.config.update("jax_platforms", "cpu")

    p = ArgumentParser()
    p.add_argument("--out", default=None, help="write JSON here")
    p.add_argument("--compare", default=None,
                   help="baseline JSON to diff against (exit 1 on drift)")
    p.add_argument("--no-walltime", action="store_true",
                   help="compile-only counts (use when the core is busy)")
    args = p.parse_args(argv)

    cur = measure(walltime=not args.no_walltime)
    print(json.dumps(cur))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(cur, f, indent=1)
    if args.compare:
        with open(args.compare) as f:
            base = json.load(f)
        if compare(base, cur):
            sys.exit(1)


if __name__ == "__main__":
    main()
