"""Multi-view 2D→3D feature aggregation (stage L5) — the throughput-metric path.

Rebuild of cuda_project_image_to_sparse_voxel/aggregate_voxel_features_onthefly.py
(and its helpers build_sparse_occupancy.py / prepare_tensor_data.py /
debug_project_features.py). The reference spawns TWO Python subprocesses per view,
resizes 512 feature channels with per-channel cv2 on the CPU, round-trips every
view's projection through disk, and accumulates per-voxel sums in a Python dict
(SURVEY §3.2). Here the whole sweep is on-device:

  * occupancy is built once (ops/voxelize.occupancy_from_grid, bit-matching
    build_sparse_occupancy.py's round() snap + 1-based IDs),
  * per view-chunk, feature maps are resized on device (jax.image bilinear — the
    reference's cv2.INTER_LINEAR per channel), ray-marched to first hit, and
    segment-summed into HBM-resident [V+1, C] accumulators (deterministic,
    replacing CUDA atomicAdd),
  * views stream through a lax.scan inside one jitted chunk program; multi-chip
    runs shard the view axis over a Mesh and psum the accumulators over ICI
    (parallel/lift.py),
  * checkpoints every ``checkpoint_every`` views and the final
    ALL_nonzero_voxel_features artifact keep the reference's file contract
    ({xyz, avg_feats fp16, voxel_coords}, aggregate…onthefly.py:379-453).

Camera conventions match prepare_tensor_data.py:165-174: extrinsics arrive as
world→cam (R, tvec) and are inverted to cam→world [Rᵀ | -Rᵀt]; intrinsics
[fx, fy, cx, cy] are scaled by the downsample factor.
"""

from __future__ import annotations

import dataclasses
import glob
import json
import os
import time
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from segsplat_tpu.core.types import VoxelGrid
from segsplat_tpu.io.artifacts import load_feature_map, save_voxel_features
from segsplat_tpu.io.ply import read_voxel_grid_ply, write_voxel_grid_ply
from segsplat_tpu.ops.lift import default_max_steps
from segsplat_tpu.ops.voxelize import occupancy_from_grid


@dataclasses.dataclass
class LiftConfig:
    depth_min: float = 0.01            # debug_project_features.py:164-170
    depth_max: float = 10.0
    ray_increment_factor: float = 0.5  # ray step = voxel_size * this
    downsample_factor: float = 0.5     # aggregate…onthefly.py:209
    max_views: int = 216               # :106
    checkpoint_every: int = 20         # :317
    view_chunk: int = 8                # views per compiled scan step
    method: str = "splat"              # "splat" (fast, ops/lift_splat) or
    #                                    "dda" (exact kernel transcription)
    splat_max_tiles_per_axis: int = 8
    splat_max_per_tile: int = 128
    splat_big_budget: int = 0          # dual-bin big-voxel budget (0 = V/8);
    #                                    overflow is surfaced as a [WARN]


_MAX_TRANSFER_BYTES = 128 * 1024 ** 2  # single host→device puts >~256 MiB
#   stall the axon tunnel relay permanently (frozen at 254 MiB written,
#   measured round 3); 128 MiB keeps 2× margin and costs only per-POST
#   overhead at the tunnel's ~13 MB/s.


def _device_put_bounded(arr: np.ndarray):
    """device_put ``arr`` in leading-axis slices of ≤_MAX_TRANSFER_BYTES,
    reassembled on device (jnp.concatenate). Returns a device array."""
    import jax
    import jax.numpy as jnp

    if arr.nbytes <= _MAX_TRANSFER_BYTES:
        return jax.device_put(arr)
    per_row = max(arr.nbytes // max(arr.shape[0], 1), 1)
    rows = max(int(_MAX_TRANSFER_BYTES // per_row), 1)
    parts = [jax.device_put(np.ascontiguousarray(arr[i:i + rows]))
             for i in range(0, arr.shape[0], rows)]
    return jnp.concatenate(parts, axis=0)


def load_camera_json(path: str) -> Tuple[Dict[str, dict], Dict[str, list],
                                         Dict[str, Tuple[int, int]]]:
    """Parse the stage's camera-params JSON (COLMAP-derived): returns
    (name→{R, tvec, camera_id}, camera_id→[fx,fy,cx,cy], camera_id→(W,H)
    for entries that carry width/height). Accepts both the
    {"images": {...}, "cameras": {...}} layout prepare_tensor_data.py reads and
    the flat {"cameras": [...]} layout the aggregator rescales."""
    with open(path) as f:
        data = json.load(f)
    name_to_entry: Dict[str, dict] = {}
    cam_params: Dict[str, list] = {}
    cam_sizes: Dict[str, Tuple[int, int]] = {}
    if isinstance(data.get("images"), dict):
        for _k, entry in data["images"].items():
            base = os.path.splitext(os.path.basename(entry["name"]))[0]
            name_to_entry[base] = entry
        for cid, cam in data.get("cameras", {}).items():
            p = cam["params"]
            cam_params[str(cid)] = ([p[0], p[0], p[1], p[2]] if len(p) == 3
                                    else list(p[:4]))
            if "width" in cam and "height" in cam:
                cam_sizes[str(cid)] = (int(cam["width"]), int(cam["height"]))
    else:
        for i, cam in enumerate(data.get("cameras", [])):
            name = os.path.splitext(os.path.basename(
                cam.get("name", f"cam{i}")))[0]
            entry = dict(cam)
            entry.setdefault("camera_id", str(i))
            name_to_entry[name] = entry
            if "intrinsic" in cam:
                cam_params[str(entry["camera_id"])] = list(cam["intrinsic"][:4])
            if "width" in cam and "height" in cam:
                cam_sizes[str(entry["camera_id"])] = (int(cam["width"]),
                                                      int(cam["height"]))
    return name_to_entry, cam_params, cam_sizes


def camera_arrays_for(files: Sequence[str], name_to_entry, cam_params,
                      downsample: float) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    """Match feature files to cameras; build c2w [V,4,4] + intrinsics [V,4]."""
    c2ws, intr, kept = [], [], []
    for fpath in files:
        base = os.path.splitext(os.path.basename(fpath))[0]
        entry = name_to_entry.get(base)
        if entry is None:
            print(f"[WARN] No camera entry for feature file {base}, skipping")
            continue
        R = np.asarray(entry["R"], np.float32)
        t = np.asarray(entry["tvec"], np.float32)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = R.T
        c2w[:3, 3] = -R.T @ t
        p = (np.asarray(cam_params[str(entry["camera_id"])], np.float32)
             if str(entry.get("camera_id")) in cam_params
             else np.asarray(entry["intrinsic"][:4], np.float32))
        c2ws.append(c2w)
        intr.append(p * downsample)
        kept.append(fpath)
    return (np.stack(c2ws) if c2ws else np.zeros((0, 4, 4), np.float32),
            np.stack(intr) if intr else np.zeros((0, 4), np.float32), kept)


def aggregate_voxel_features(voxel_ply: str, lseg_dir: str, camera_params: str,
                             out_dir: str, cfg: LiftConfig = LiftConfig(),
                             image_size: Optional[Tuple[int, int]] = None,
                             mesh=None, first_only: bool = False,
                             allow_random_weights: bool = False) -> dict:
    """Run the full multi-view lift; writes checkpoints + final artifacts into
    ``out_dir``. With ``mesh`` (a (view, tensor) jax.sharding.Mesh of >1
    device) each view chunk is sharded over the mesh's view axis and the voxel
    accumulators psum-merge over ICI. Returns {"sums", "counts", "grid",
    "views_per_sec", "artifact" (final .pt path)}."""
    import jax
    import jax.numpy as jnp

    from segsplat_tpu.ops.lift import first_hit_voxels, scatter_features
    from segsplat_tpu.ops.lift_splat import first_hit_voxels_splat

    centers, colors, vs, origin, shape = read_voxel_grid_ply(voxel_ply)
    if vs is None:
        raise RuntimeError(f"{voxel_ply}: missing voxel_size header comment")
    grid = VoxelGrid(coords=jnp.asarray(
        np.round((centers - origin) / vs).astype(np.int32)),
        origin=jnp.asarray(origin, jnp.float32),
        voxel_size=jnp.asarray(vs, jnp.float32),
        shape=shape if shape else ())
    occ, occ_origin, occ_shape = occupancy_from_grid(grid)
    num_ids = len(centers) + 1
    print(f"[INFO] occupancy {occ_shape}, {len(centers)} voxels @ {vs} "
          f"(method={cfg.method})")
    # splat path: snapped centers + 1-based ids in occupancy enumeration order
    snap_centers = jnp.asarray(
        np.round((centers - occ_origin) / vs) * vs + occ_origin, jnp.float32)
    snap_ids = jnp.arange(1, len(centers) + 1, dtype=jnp.int32)

    from segsplat_tpu.io.provenance import (read_weights_source,
                                            require_untainted,
                                            write_provenance)
    weights_source = read_weights_source(lseg_dir)
    require_untainted(weights_source, allow_random_weights,
                      f"feature dir {lseg_dir}")
    if weights_source is not None:  # propagate taint/lineage to our artifacts
        write_provenance(out_dir, weights_source, stage="lift")
    files = sorted(glob.glob(os.path.join(lseg_dir, "*.npy")))[:cfg.max_views]
    if first_only:
        files = files[:1]
    if not files:
        raise RuntimeError(f"No .npy feature files in {lseg_dir}")
    name_to_entry, cam_params, cam_sizes = load_camera_json(
        camera_params)
    c2ws, intr, files = camera_arrays_for(files, name_to_entry, cam_params,
                                          cfg.downsample_factor)

    probe = load_feature_map(files[0])
    C = probe.shape[0]
    if image_size is not None:
        H, W = image_size
        H = int(round(H * cfg.downsample_factor))
        W = int(round(W * cfg.downsample_factor))
    elif cam_sizes:
        # the ray grid must match the plane the (downsample-scaled)
        # intrinsics describe — the camera's NATIVE image size, not the
        # LSeg feature-map size (360-short-side). Running on the feature
        # grid with native-plane intrinsics skews every ray (cx ≈ W_native/2
        # can exceed the feature width entirely); the reference upsamples
        # features to the image grid before the kernel for the same reason
        # (prepare_tensor_data.py:117-127).
        wh = next(iter(cam_sizes.values()))
        H = int(round(wh[1] * cfg.downsample_factor))
        W = int(round(wh[0] * cfg.downsample_factor))
    else:
        H, W = probe.shape[1], probe.shape[2]
        print(f"[WARN] camera JSON carries no width/height and no "
              f"image_size given — lifting on the {H}x{W} feature grid; "
              f"intrinsics must describe THIS grid for rays to align")

    inc = float(vs) * cfg.ray_increment_factor
    # conservative static step budget over ALL views: the smallest focals
    # spread rays widest, and the farthest principal-point deviation sets
    # the longest corner ray (median-fx-for-both-axes underestimated both,
    # silently dropping far edge-pixel hits on anisotropic intrinsics)
    fx_min = float(np.min(intr[:, 0])) if len(intr) else 1.0
    fy_min = float(np.min(intr[:, 1])) if len(intr) else 1.0
    cx_w = float(np.max(np.maximum(intr[:, 2], W - 1 - intr[:, 2]))) \
        if len(intr) else None
    cy_w = float(np.max(np.maximum(intr[:, 3], H - 1 - intr[:, 3]))) \
        if len(intr) else None
    steps = default_max_steps(W, H, fx_min, fy_min, cfg.depth_min,
                              cfg.depth_max, inc, cx=cx_w, cy=cy_w)

    def one(carry, view):
        s, c, of = carry
        fmap, c2w, K = view
        fmap = jax.image.resize(fmap.astype(jnp.float32), (C, H, W),
                                method="bilinear")
        fmap = jnp.transpose(fmap, (1, 2, 0))
        if cfg.method == "splat":
            # fused first-hit + tile-level MXU accumulation — avoids the
            # [H,W] hit image + 512k-row XLA scatter (measured ~21 ms/view
            # flat, see ops/lift_splat.lift_view_splat)
            from segsplat_tpu.ops.lift_splat import lift_view_splat
            ds, dc, dof = lift_view_splat(
                snap_centers, snap_ids, c2w, K,
                jnp.asarray(vs, jnp.float32), cfg.depth_min, cfg.depth_max,
                jnp.asarray(inc, jnp.float32), fmap, num_ids, W, H,
                max_tiles_per_axis=cfg.splat_max_tiles_per_axis,
                max_per_tile=cfg.splat_max_per_tile,
                big_budget=cfg.splat_big_budget or None)
            return (s + ds, c + dc, jnp.maximum(of, dof)), None
        else:
            hits = first_hit_voxels(occ, c2w, K,
                                    jnp.asarray(occ_origin, jnp.float32),
                                    jnp.asarray(vs, jnp.float32),
                                    cfg.depth_min, cfg.depth_max,
                                    jnp.asarray(inc, jnp.float32),
                                    W, H, steps)
        ds, dc = scatter_features(fmap, hits, num_ids)
        return (s + ds, c + dc, of), None

    if mesh is not None and mesh.devices.size > 1:
        # SPMD: shard each view chunk over the mesh's view axis; every chip
        # ray-marches + scatters its slice, one psum over ICI merges the
        # per-chip voxel partials (same layout as parallel/lift.py).
        from jax.sharding import PartitionSpec as P
        from segsplat_tpu.parallel.mesh import TENSOR_AXIS, VIEW_AXIS
        assert mesh.shape.get(TENSOR_AXIS, 1) == 1, (
            "pipeline lift shards the view axis; use parallel.lift."
            "lift_views_sharded directly for channel (tensor) sharding")
        n_view = mesh.shape[VIEW_AXIS]
        if cfg.view_chunk % n_view != 0:
            cfg = dataclasses.replace(
                cfg, view_chunk=-(-cfg.view_chunk // n_view) * n_view)
            print(f"[INFO] view_chunk rounded up to {cfg.view_chunk} "
                  f"(multiple of mesh view={n_view})")

        @jax.jit
        def lift_chunk(feats_raw, c2w_chunk, intr_chunk, sums, counts):
            @partial(
                jax.shard_map, mesh=mesh,
                in_specs=(P(VIEW_AXIS), P(VIEW_AXIS), P(VIEW_AXIS)),
                out_specs=(P(), P(), P()))
            def run(feats_l, c2w_l, intr_l):
                init = (jax.lax.pcast(jnp.zeros((num_ids, C), jnp.float32),
                                      (VIEW_AXIS,), to="varying"),
                        jax.lax.pcast(jnp.zeros((num_ids,), jnp.int32),
                                      (VIEW_AXIS,), to="varying"),
                        jax.lax.pcast(jnp.int32(0), (VIEW_AXIS,),
                                      to="varying"))
                (s, c, of), _ = jax.lax.scan(one, init,
                                             (feats_l, c2w_l, intr_l))
                return (jax.lax.psum(s, VIEW_AXIS),
                        jax.lax.psum(c, VIEW_AXIS),
                        jax.lax.pmax(of, VIEW_AXIS))

            ds, dc, dof = run(feats_raw, c2w_chunk, intr_chunk)
            return sums + ds, counts + dc, dof
    else:
        @partial(jax.jit, static_argnames=())
        def lift_chunk(feats_raw, c2w_chunk, intr_chunk, sums, counts):
            """feats_raw [B, C, h, w] → resize to [H, W] → lift each view."""
            (sums, counts, of), _ = jax.lax.scan(
                one, (sums, counts, jnp.int32(0)),
                (feats_raw, c2w_chunk, intr_chunk))
            return sums, counts, of

    sums = jnp.zeros((num_ids, C), jnp.float32)
    counts = jnp.zeros((num_ids,), jnp.int32)
    overflow_max = jnp.int32(0)

    os.makedirs(out_dir, exist_ok=True)
    t0 = time.perf_counter()
    done = 0
    B = cfg.view_chunk
    for start in range(0, len(files), B):
        batch = files[start:start + B]
        # keep the on-disk fp16 (upcasting here would DOUBLE host→device
        # bytes — the device-side `one` upcasts before the resize), and ship
        # each view as its OWN bounded transfer: a single host→device
        # transfer larger than ~256 MiB stalls the axon tunnel relay
        # PERMANENTLY (measured round 3: a 796 MB 4-view fp16 chunk froze at
        # exactly 254 MiB written with zero further socket traffic), so the
        # chunked batch is assembled on device from per-view puts.
        views = [_device_put_bounded(load_feature_map(f)) for f in batch]
        nb = len(batch)
        if nb < B:  # pad the tail chunk with zero-intrinsics views (no rays hit)
            views += [jnp.zeros_like(views[0])] * (B - nb)
        feats = jnp.stack(views)
        cc = np.pad(c2ws[start:start + nb], ((0, B - nb), (0, 0), (0, 0)))
        ii = np.pad(intr[start:start + nb], ((0, B - nb), (0, 0)))
        if nb < B:
            ii[nb:, 0] = ii[nb:, 1] = 1.0
            ii[nb:, 2] = -1e9  # rays point nowhere → zero hits
        sums, counts, chunk_of = lift_chunk(feats, jnp.asarray(cc),
                                            jnp.asarray(ii), sums, counts)
        # keep the overflow max ON DEVICE — an int() here would force a host
        # sync (one tunnel RTT) per chunk and serialize device compute with
        # the next chunk's feature loading; checked once after the loop
        overflow_max = jnp.maximum(overflow_max, chunk_of)
        done += nb
        # fire when done CROSSES a multiple of checkpoint_every — an exact
        # `done % every == 0` only triggers when every is a multiple of
        # view_chunk (defaults 20/8 would checkpoint at 40, 80, … not 20)
        if cfg.checkpoint_every and done < len(files) \
                and (done // cfg.checkpoint_every
                     > (done - nb) // cfg.checkpoint_every):
            _write_artifacts(out_dir, done, sums, counts, centers,
                             grid, vs, final=False)
    # the final artifact is written unconditionally — checkpoint_every only
    # controls the intermediate resumability checkpoints (a 0 value used to
    # skip this write and crash the return below on the unbound name)
    artifact = _write_artifacts(out_dir, done, sums, counts, centers,
                                grid, vs, final=True)
    jax.block_until_ready(sums)
    dt = time.perf_counter() - t0
    vps = done / dt if dt > 0 else float("inf")
    if int(overflow_max) > 0:
        print(f"[WARN] lift coverage overflow: up to {int(overflow_max)} "
              f"truncated slots/view (big-voxel budget and/or per-tile "
              f"K cap) — raise LiftConfig.splat_big_budget / "
              f"splat_max_per_tile; pixels past the cap lift the wrong "
              f"voxel silently otherwise")
    print(f"[INFO] lifted {done} views in {dt:.2f}s = {vps:.2f} views/s")
    return {"sums": sums, "counts": counts, "grid": grid, "views_per_sec": vps,
            "artifact": artifact}


def _write_artifacts(out_dir, done, sums, counts, centers, grid, vs, final):
    import numpy as np

    s = np.asarray(sums)[1:]            # drop miss-collector row 0
    c = np.asarray(counts)[1:]
    nz = c > 0
    mean = np.zeros_like(s)
    mean[nz] = s[nz] / c[nz, None]
    coords = np.asarray(grid.coords)
    tag = "ALL_nonzero_voxel_features" if final else f"checkpoint_{done}img"
    pt_path = os.path.join(out_dir, f"{tag}_{int(nz.sum())}vox.pt")
    save_voxel_features(pt_path,
                        xyz=centers[nz], avg_feats=mean[nz],
                        voxel_coords=coords[nz][:, ::-1])  # (z,y,x) like the ref
    # hit-count visualization PLY (aggregate…onthefly.py:339-377)
    heat = np.clip(c / max(c.max(), 1), 0, 1)
    cols = np.stack([255 * heat, 64 + 0 * heat, 255 * (1 - heat)], axis=1
                    ).astype(np.uint8)
    write_voxel_grid_ply(os.path.join(out_dir, f"{tag}_hitcounts.ply"),
                         centers, cols, float(vs),
                         np.asarray(grid.origin), grid_shape=None)
    return pt_path
