"""Benchmark: semantic novel-view render FPS @ 1080p on one TPU chip, plus the
multi-view feature-lift throughput as an extra metric on the same line.

The reference's FPS-metric path is gsplat 32-channel logit rasterization per view
(voxel_to_gaussian/render_semantics_logits.py:92-105) on a CUDA GPU; the north-star
target is >=30 FPS at 1080p on one v5e chip (BASELINE.md). The reference publishes
no numbers (BASELINE.json published: {}), so vs_baseline is measured against that
30-FPS target.

The second north-star — multi-view 512-D feature-lift throughput (the
reference's aggregate_voxel_features_onthefly.py loop: one CUDA kernel run +
2 subprocesses + CPU resize + disk round-trip per view) — is reported in the
same JSON object under "extra" at officescene scale (876×584 rays, ~109k
voxels, 512 channels). Its denominator is MEASURED: baseline_host_lift.json
(scripts/measure_reference_baseline.py) times the reference's
hardware-independent host stages per view on this machine — a lower bound on
reference s/view with ZERO GPU time counted — and lift_vs_baseline is our
views/s divided by that bound's views/s (so the reported ratio is itself a
lower bound on the true speedup).

"extra" also carries a HOSTILE render scene (clustered, mixed-scale,
low-opacity Gaussians → heavy-tailed tile depth) with its FPS, real pair
count, and the per-tile K-cap overflow — so the headline number can't hide
behind a benign uniform scene and no truncation is silent.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compilation cache: the two bench programs compile in
    ~25 s + ~7 min cold but single-digit seconds warm (measured through the
    axon tunnel), so repeat bench runs are timing-only."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(
                              os.path.abspath(__file__)), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover - cache is best-effort
        print(f"[WARN] compile cache unavailable: {e}", file=sys.stderr)


def _probe_backend(timeout_s: int = 90) -> None:
    """Fail fast if the TPU backend is unreachable. A wedged tunnel relay
    makes the first jax.devices() sleep FOREVER in the claim/rebind loop
    (measured round 3: host-side relay died and never came back), which
    would hang the whole bench instead of reporting. Probe in a subprocess
    with a hard timeout and exit nonzero with a diagnostic JSON line."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            timeout=timeout_s, capture_output=True, text=True)
        ok = r.returncode == 0
        detail = (r.stdout + r.stderr).strip()[-200:]
    except subprocess.TimeoutExpired:
        ok, detail = False, f"jax.devices() unresponsive after {timeout_s}s"
    if not ok:
        print(json.dumps({
            "metric": "semantic_render_fps", "value": 0.0, "unit": "fps",
            "vs_baseline": 0.0,
            "extra": {"error": f"TPU backend unreachable: {detail}"}}))
        sys.exit(1)


def headline_render_scene(W: int = 1920, H: int = 1080, N: int = 200_000):
    """The headline-FPS scene (seed 0): 200k Gaussians in a 4 m box in front
    of the camera. Shared with scripts/perf_guard.py so the CPU perf guard
    tracks EXACTLY the benched program."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.random((N, 3)) * np.array([4.0, 3.0, 4.0])
                      + np.array([-2.0, -1.5, 2.0]), jnp.float32)
    scales = jnp.asarray(np.exp(rng.normal(-4.6, 0.3, (N, 3))), jnp.float32)
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    quats = jnp.asarray(quats)
    opac = jnp.asarray(rng.uniform(0.3, 0.95, (N,)), jnp.float32)
    logits = jnp.asarray(rng.standard_normal((N, 32)), jnp.float32)
    # max_tiles_per_axis=3 covers this scene's splat radii exactly (~11 px → ≤3
    # tiles); the Pallas backend is the fused TPU blend kernel. pair_cap:
    # real pairs measured 1.20M/frame (scripts/perf_bin_dissect.py) — 1.5M
    # keeps a 25% margin while cutting the payload gather below N·m²=1.8M.
    kw = dict(width=W, height=H, max_tiles_per_axis=3, max_per_tile=256,
              backend="pallas", pair_cap=1_500_000)
    return dict(xyz=xyz, scales=scales, quats=quats, opac=opac,
                logits=logits, kw=kw, W=W, H=H)


def hostile_render_scene(W: int = 1920, H: int = 1080, N: int = 200_000):
    """The adversarial render scene (seed 7): 40 tight clusters, log-normal
    mixed scales (~5–60 px splats), low-opacity tail — heavy-tailed tile
    depth like a post-densify trained scene. Shared with perf_guard.py."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    n_clusters = 40
    cl_centers = (rng.random((n_clusters, 3)) * np.array([4.0, 3.0, 4.0])
                  + np.array([-2.0, -1.5, 2.0]))
    # heavy-tailed cluster sizes (a few clusters own most Gaussians)
    w = rng.pareto(1.2, n_clusters) + 0.05
    counts = np.maximum((w / w.sum() * N).astype(int), 1)
    counts[0] += N - counts.sum()
    assign = np.repeat(np.arange(n_clusters), counts)[:N]
    xyz = (cl_centers[assign]
           + rng.normal(0, 0.08, (N, 3))).astype(np.float32)
    # mixed scales: median ~1 cm with a fat tail to ~10 cm
    scales = np.exp(rng.normal(-4.3, 0.8, (N, 3))).astype(np.float32)
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.02, 0.9, (N,)).astype(np.float32)
    logits = rng.standard_normal((N, 32)).astype(np.float32)
    kw = dict(width=W, height=H, max_tiles_per_axis=6, max_per_tile=512,
              backend="pallas", pair_cap=6_000_000)
    return dict(xyz=jnp.asarray(xyz), scales=jnp.asarray(scales),
                quats=jnp.asarray(quats), opac=jnp.asarray(opac),
                logits=jnp.asarray(logits), kw=kw, W=W, H=H)


def main() -> None:
    _probe_backend()

    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from segsplat_tpu.core.types import Camera
    from segsplat_tpu.ops.rasterize import rasterize

    sc = headline_render_scene()
    W, H = sc["W"], sc["H"]
    xyz, scales, quats = sc["xyz"], sc["scales"], sc["quats"]
    opac, logits, kw = sc["opac"], sc["logits"], sc["kw"]

    cam = Camera(R=jnp.eye(3), T=jnp.zeros(3),
                 fov_x=jnp.asarray(1.2), fov_y=jnp.asarray(0.75),
                 width=W, height=H)
    viewmat = cam.world_view_transform()
    K = cam.intrinsics()
    bg = jnp.zeros((32,), jnp.float32)

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
    # distinct viewmats per repeat so cache-friendly binning can't flatter
    # the sort (3 repeats × 16 fresh camera angles)
    vm_sets = [jnp.stack([vm_of(0.002 * (r * frames + i))
                          for i in range(frames)]) for r in range(3)]
    float(many(vm_sets[0]))  # compile + warm
    times = []
    for vms in vm_sets:
        t0 = time.perf_counter()
        float(many(vms))
        times.append(time.perf_counter() - t0)
    per_frame = (min(times) - rtt) / frames
    fps = 1.0 / per_frame

    hostile = bench_hostile_render(rtt)
    vps = bench_lift(rtt)

    extra = {
        "lift_views_per_s": round(vps, 2),
        "lift_config": "876x584 rays, 109k vox, 512ch, splat m=8 K=128",
        "hostile_render": hostile,
    }
    denom_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "baseline_host_lift.json")
    if os.path.exists(denom_path):
        with open(denom_path) as f:
            denom = json.load(f)
        ref_vps = denom["views_per_s_upper_bound"]
        extra["lift_vs_baseline"] = round(vps / ref_vps, 1)
        extra["lift_baseline_views_per_s"] = ref_vps

    print(json.dumps({
        "metric": "semantic_render_fps_1080p_200k",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 3),
        "extra": extra,
    }))


def bench_hostile_render(rtt: float) -> dict:
    """Adversarial 1080p scene: 200k Gaussians in 40 tight clusters with
    log-normal mixed scales (splats from ~5 px to ~60 px) and a low-opacity
    tail — heavy-tailed tile depth like a real trained scene after a densify
    burst, unlike the benign uniform headline scene. pair_cap 6M (exact while
    num_pairs stays below it — reported); reports FPS, the real pair count,
    and the per-tile K-cap overflow so any truncation is visible in BENCH
    json."""
    import jax
    import jax.numpy as jnp

    from segsplat_tpu.core.types import Camera
    from segsplat_tpu.ops.rasterize import rasterize

    sc = hostile_render_scene()
    W, H, kw = sc["W"], sc["H"], sc["kw"]
    xyz_j, sc_j, qu_j = sc["xyz"], sc["scales"], sc["quats"]
    op_j, lg_j = sc["opac"], sc["logits"]

    cam = Camera(R=jnp.eye(3), T=jnp.zeros(3),
                 fov_x=jnp.asarray(1.2), fov_y=jnp.asarray(0.75),
                 width=W, height=H)
    K = cam.intrinsics()
    bg = jnp.zeros((32,), jnp.float32)

    def one_frame(vm):
        out = rasterize(xyz_j, sc_j, qu_j, op_j, lg_j, vm,
                        K[0, 0], K[1, 1], K[0, 2], K[1, 2], bg=bg, **kw)
        probe = jnp.sum(jnp.argmax(out["image"], axis=-1).astype(jnp.int32))
        return probe, out["num_pairs"], out["tile_overflow"]

    @jax.jit
    def many(vms):
        def step(c, vm):
            probe, npair, ovf = one_frame(vm)
            return (c[0] + probe, jnp.maximum(c[1], npair),
                    jnp.maximum(c[2], ovf)), None
        (tot, npair, ovf), _ = jax.lax.scan(
            step, (jnp.int32(0), jnp.int32(0), jnp.int32(0)), vms)
        return tot, npair, ovf

    def vm_of(a):
        R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                      [-np.sin(a), 0, np.cos(a)]], np.float32)
        c = Camera(R=jnp.asarray(R), T=jnp.zeros(3),
                   fov_x=jnp.asarray(1.2), fov_y=jnp.asarray(0.75),
                   width=W, height=H)
        return c.world_view_transform()

    frames = 8
    vm_sets = [jnp.stack([vm_of(0.003 * (r * frames + i))
                          for i in range(frames)]) for r in range(3)]
    tot, npair, ovf = many(vm_sets[0])
    float(tot)  # compile + warm
    times = []
    for vms in vm_sets:
        t0 = time.perf_counter()
        t_, npair, ovf = many(vms)
        float(t_)
        times.append(time.perf_counter() - t0)
    per_frame = (min(times) - rtt) / frames
    return {"fps": round(1.0 / per_frame, 2),
            "config": "1080p 200k clustered/mixed-scale/low-opacity m=6 K=512",
            "max_pairs_per_frame": int(npair),
            "tile_overflow_max": int(ovf)}


def officescene_lift_scene(n_views: int = 8):
    """Shared synthetic officescene-scale lift inputs (876×584 rays, ~109k
    voxels @ 0.04 m, 512 channels) — the SAME scene for bench.py's headline
    views/s and the per-stage scoreboards (scripts/perf_lift_stages.py), so
    the decomposition always explains the reported number."""
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    W, H, C = 876, 584, 512
    vs = 0.04
    # ~109k occupied voxels: a 60×44×42 box shell-ish sample
    nv = 109_000
    coords = rng.choice(60 * 44 * 42, size=nv, replace=False)
    ii = np.stack(np.unravel_index(coords, (60, 44, 42)), axis=1)
    origin = np.array([-1.2, -0.9, 1.0], np.float32)
    centers = jnp.asarray(origin + ii * vs, jnp.float32)
    ids = jnp.arange(1, nv + 1, dtype=jnp.int32)
    feats = jnp.asarray(rng.random((n_views, C, H // 2, W // 2))
                        .astype(np.float16))
    fx = 700.0 * 0.5
    intr = jnp.asarray(np.tile([fx, fx, W / 2, H / 2], (n_views, 1)),
                       jnp.float32)
    c2ws = []
    for i in range(n_views):
        a = 0.02 * i
        Rm = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                       [-np.sin(a), 0, np.cos(a)]], np.float32)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = Rm
        c2ws.append(c2w)
    return dict(W=W, H=H, C=C, vs=vs, centers=centers, ids=ids, feats=feats,
                intr=intr, c2ws=jnp.asarray(np.stack(c2ws)))


def bench_lift(rtt: float) -> float:
    """Feature-lift throughput at officescene scale: bilinear 512-ch upsample +
    first-hit splat ray march + deterministic scatter into the voxel table —
    the full per-view work of pipeline/lift_features.lift_chunk."""
    import jax
    import jax.numpy as jnp

    from segsplat_tpu.ops.lift_splat import lift_view_splat

    sc = officescene_lift_scene(n_views=8)
    W, H, C, vs = sc["W"], sc["H"], sc["C"], sc["vs"]
    centers, ids = sc["centers"], sc["ids"]
    feats, intr, c2ws = sc["feats"], sc["intr"], sc["c2ws"]
    num_ids = centers.shape[0] + 1
    V = feats.shape[0]
    inc = jnp.asarray(vs * 0.5, jnp.float32)

    @jax.jit
    def lift_all(feats_, c2ws_, intr_, centers_, ids_):
        def one(carry, view):
            s, c = carry
            fmap, c2w, K = view
            fmap = jax.image.resize(fmap.astype(jnp.float32), (C, H, W),
                                    method="bilinear")
            fmap = jnp.transpose(fmap, (1, 2, 0))
            ds, dc, _of = lift_view_splat(
                centers_, ids_, c2w, K, jnp.asarray(vs, jnp.float32),
                0.01, 10.0, inc, fmap, num_ids, W, H,
                max_tiles_per_axis=8, max_per_tile=128)
            return (s + ds, c + dc), None

        init = (jnp.zeros((num_ids, C), jnp.float32),
                jnp.zeros((num_ids,), jnp.int32))
        (s, c), _ = jax.lax.scan(one, init, (feats_, c2ws_, intr_))
        return jnp.sum(s[::64, ::64]) + jnp.sum(c[::64])

    args = (feats, c2ws, intr, centers, ids)
    float(lift_all(*args))  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(lift_all(*args))
        times.append(time.perf_counter() - t0)
    per_view = (min(times) - rtt) / V
    return 1.0 / per_view


if __name__ == "__main__":
    main()
