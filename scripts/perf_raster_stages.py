"""Stage-level timing of the Pallas rasterizer at bench config (1080p, 200k
Gaussians, 32 channels) on the real TPU chip.

Decomposes the frame budget that bench.py measures end-to-end:
  project → depth argsort → pair-key sort → payload build/gathers → blend kernel
so optimization work (VERDICT round-1 item #1: binning sort + payload gathers)
has a scoreboard per stage.

Methodology (CLAUDE.md): through the remote tunnel block_until_ready does not
reliably wait, so each stage runs F times inside ONE jitted lax.scan with
distinct per-iteration inputs; a host-transferred scalar forces sync and the
measured RTT is subtracted. Large constants are passed as ARGUMENTS (closure
constants get shipped to the remote compiler → HTTP 413).
"""

from __future__ import annotations

import argparse
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from segsplat_tpu.core.types import Camera
from segsplat_tpu.ops import rasterize as R


def make_scene(n, seed=0):
    rng = np.random.default_rng(seed)
    xyz = jnp.asarray(rng.random((n, 3)) * np.array([4.0, 3.0, 4.0])
                      + np.array([-2.0, -1.5, 2.0]), jnp.float32)
    scales = jnp.asarray(np.exp(rng.normal(-4.6, 0.3, (n, 3))), jnp.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    quats = jnp.asarray(quats)
    opac = jnp.asarray(rng.uniform(0.3, 0.95, (n,)), jnp.float32)
    logits = jnp.asarray(rng.standard_normal((n, 32)), jnp.float32)
    return xyz, scales, quats, opac, logits


def vm_of(a, W, H):
    Rm = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                   [-np.sin(a), 0, np.cos(a)]], np.float32)
    c = Camera(R=jnp.asarray(Rm), T=jnp.zeros(3),
               fov_x=jnp.asarray(1.2), fov_y=jnp.asarray(0.75),
               width=W, height=H)
    return c.world_view_transform()


def measure_rtt():
    tiny = jax.jit(lambda x: x + 1)
    float(jnp.sum(tiny(jnp.ones((8, 8)))))
    t0 = time.perf_counter()
    float(jnp.sum(tiny(jnp.ones((8, 8)))))
    return time.perf_counter() - t0


def timeit(name, fn, xs, consts, rtt, reps=3):
    """fn(x, *consts) -> scalar; xs is a stacked [F, ...] pytree."""
    @jax.jit
    def many(xs_, *cs):
        tot, _ = jax.lax.scan(lambda c, x: (c + fn(x, *cs), None),
                              jnp.float32(0), xs_)
        return tot

    float(many(xs, *consts))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(many(xs, *consts))
        ts.append(time.perf_counter() - t0)
    F = jax.tree_util.tree_leaves(xs)[0].shape[0]
    ms = (min(ts) - rtt) / F * 1e3
    print(f"{name:34s} {ms:8.2f} ms/frame")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--m", type=int, default=3)
    ap.add_argument("--k", type=int, default=256)
    args = ap.parse_args()

    W, H = 1920, 1080
    n, m, K, F = args.n, args.m, args.k, args.frames
    xyz, scales, quats, opac, logits = make_scene(n)
    cam = Camera(R=jnp.eye(3), T=jnp.zeros(3), fov_x=jnp.asarray(1.2),
                 fov_y=jnp.asarray(0.75), width=W, height=H)
    Kin = cam.intrinsics()
    fx, fy, cx, cy = Kin[0, 0], Kin[1, 1], Kin[0, 2], Kin[1, 2]
    bg = jnp.zeros((32,), jnp.float32)
    vms = jnp.stack([vm_of(0.002 * i, W, H) for i in range(F)])
    rtt = measure_rtt()
    print(f"devices={jax.devices()}  rtt={rtt*1e3:.1f} ms  n={n} m={m} K={K}")

    # ---- full frame ----
    def full(vm, *cs):
        out = R.rasterize(*cs[:5], vm, fx, fy, cx, cy, width=W, height=H,
                          bg=bg, max_tiles_per_axis=m, max_per_tile=K,
                          backend="pallas")
        return jnp.sum(out["image"][::64, ::64, 0])
    t_full = timeit("full rasterize (pallas)", full, vms,
                    (xyz, scales, quats, opac, logits), rtt)

    # ---- project ----
    def proj_fn(vm, *cs):
        p = R.project_gaussians(cs[0], cs[1], cs[2], vm, fx, fy, cx, cy, W, H)
        return (jnp.sum(p.depths) + jnp.sum(p.means2d[:, 0])
                + jnp.sum(p.radii))
    t_proj = timeit("project", proj_fn, vms, (xyz, scales, quats), rtt)

    # ---- project + bin (ranks path) ----
    def bin_fn(vm, *cs):
        p = R.project_gaussians(cs[0], cs[1], cs[2], vm, fx, fy, cx, cy, W, H)
        order, rank_sorted, offsets, _ = R._bin_gaussian_ranks(p, W, H, m)
        return (jnp.sum(offsets.astype(jnp.float32))
                + jnp.sum(rank_sorted[:: 4096].astype(jnp.float32))
                + jnp.sum(order[:: 4096].astype(jnp.float32)))
    t_bin = timeit("project + bin", bin_fn, vms, (xyz, scales, quats), rtt)

    # ---- isolate the two sorts ----
    depth_keys = []
    rng = np.random.default_rng(1)
    for i in range(F):
        depth_keys.append(rng.permutation(np.linspace(0.3, 8.0, n))
                          .astype(np.float32))
    dks = jnp.asarray(np.stack(depth_keys))

    def argsort_fn(dk):
        return jnp.sum(jnp.argsort(dk)[::4096].astype(jnp.float32))
    t_argsort = timeit("depth argsort [N]", argsort_fn, dks, (), rtt)

    L = n * m * m
    keys = jnp.asarray(rng.integers(0, 2**31, size=(F, L), dtype=np.int64)
                       .astype(np.uint32))

    def pairsort_fn(k):
        s = jax.lax.sort(k, dimension=0)
        return jnp.sum(s[::4096].astype(jnp.float32))
    t_pairsort = timeit(f"pair-key sort [{L}] u32", pairsort_fn, keys, (), rtt)

    # ---- payload gathers ----
    # gather #1: [N,128] payload by order
    orders = jnp.asarray(np.stack([rng.permutation(n) for _ in range(F)])
                         .astype(np.int32))
    payload = jnp.asarray(rng.standard_normal((n, 128)).astype(np.float32))

    def g1_fn(o, pay):
        return jnp.sum(pay[o][::4096, 0])
    t_g1 = timeit("gather#1 payload[order] [N,128]", g1_fn, orders,
                  (payload,), rtt)

    # gather #2: [L] rank_sorted rows out of [N,128]
    ranks = jnp.asarray(rng.integers(0, n, size=(F, L)).astype(np.int32))

    def g2_fn(r, pay):
        return jnp.sum(pay[r][::4096, 0])
    t_g2 = timeit(f"gather#2 payload[ranks] [{L},128]", g2_fn, ranks,
                  (payload,), rtt)

    # ---- blend kernel alone (frame-0 real binning, per-frame offsets) ----
    from segsplat_tpu.ops.blend_pallas import GEOM, PAYLOAD_WIDTH

    tx_n, ty_n = -(-W // R.TILE), -(-H // R.TILE)

    @jax.jit
    def offsets_of(vms_, xyz_, scales_, quats_):
        def one(_, vm):
            p = R.project_gaussians(xyz_, scales_, quats_, vm, fx, fy, cx, cy,
                                    W, H)
            _, _, offsets, _ = R._bin_gaussian_ranks(p, W, H, m)
            return None, offsets
        _, offs = jax.lax.scan(one, None, vms_)
        return offs

    @jax.jit
    def payload_of(vm, xyz_, scales_, quats_, opac_, logits_):
        p = R.project_gaussians(xyz_, scales_, quats_, vm, fx, fy, cx, cy, W, H)
        order, rank_sorted, _, _ = R._bin_gaussian_ranks(p, W, H, m)
        CHp = logits_.shape[1]
        pay = jnp.concatenate([
            p.means2d, p.conics, opac_[:, None],
            jnp.zeros((n, GEOM - 6), jnp.float32), logits_,
            jnp.zeros((n, PAYLOAD_WIDTH - GEOM - CHp), jnp.float32)], axis=1)
        return jnp.pad(pay[order][rank_sorted], ((0, K), (0, 0)))

    offs = offsets_of(vms, xyz, scales, quats)
    pays = payload_of(vms[0], xyz, scales, quats, opac, logits)
    from segsplat_tpu.ops.blend_pallas import blend_tiles_pallas_dma

    def blend_fn(of, pay):
        img, alpha = blend_tiles_pallas_dma(of, pay, bg, tx_n, ty_n, K)
        return jnp.sum(img[::64, ::64, 0])
    t_blend = timeit("blend kernel (incl. reshape)", blend_fn, offs,
                     (pays,), rtt)

    print("-" * 50)
    acct = t_proj + (t_bin - t_proj) + t_g1 + t_g2 + t_blend
    print(f"accounted {acct:.2f} ms vs full {t_full:.2f} ms "
          f"(bin alone {t_bin - t_proj:.2f}; sorts: depth {t_argsort:.2f} + "
          f"pairs {t_pairsort:.2f})")


if __name__ == "__main__":
    main()
