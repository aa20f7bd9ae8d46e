# Verification drive: exercise the library end-to-end through its public package
# boundary on the real backend (TPU when available). Not a unit test — a user-level
# sample of the stage-4/5 pipeline slice.
import numpy as np, jax, jax.numpy as jnp, tempfile, os, time

import segsplat_tpu
from segsplat_tpu.io.ply import (write_voxel_grid_ply, read_voxel_grid_ply,
                                 save_gaussian_ply, load_gaussian_ply)
from segsplat_tpu.io.artifacts import save_voxel_features, load_voxel_features
from segsplat_tpu.ops.voxelize import voxelize_points, occupancy_from_grid
from segsplat_tpu.ops.lift import lift_view, mean_features
from segsplat_tpu.ops.knn import initial_log_scales, nearest_neighbor_index

print("version:", segsplat_tpu.__version__, "| backend:", jax.devices())
rng = np.random.default_rng(0)
tmp = tempfile.mkdtemp()

n = 20000
xy = rng.uniform(-0.8, 0.8, (n, 2))
z = 1.5 + 0.1 * np.sin(4 * xy[:, 0]) * np.cos(4 * xy[:, 1])
pts = np.column_stack([xy, z]).astype(np.float32)
save_gaussian_ply(os.path.join(tmp, "pc.ply"), pts,
                  rng.normal(size=(n, 1, 3)), rng.normal(size=(n, 15, 3)),
                  rng.normal(size=(n, 1)), rng.normal(size=(n, 3)),
                  rng.normal(size=(n, 4)), rng.normal(size=(n, 1, 16)))
back = load_gaussian_ply(os.path.join(tmp, "pc.ply"))
print("gaussian ply roundtrip:", back["xyz"].shape, "objects restored:", "objects_dc" in back)

grid = voxelize_points(back["xyz"], 0.05)
write_voxel_grid_ply(os.path.join(tmp, "grid.ply"), np.asarray(grid.centers()),
                     np.full((grid.num_voxels, 3), 127), 0.05, np.asarray(grid.origin))
c, col, vs, origin, shape = read_voxel_grid_ply(os.path.join(tmp, "grid.ply"))
print("grid:", grid.num_voxels, "voxels; ply meta vs:", vs, "origin:", origin)

occ, o2, shp = occupancy_from_grid(grid)
print("occupancy:", shp, "ids:", int(np.asarray(occ).max()))
W = H = 64
feats = rng.normal(size=(H, W, 64)).astype(np.float32)
intr = np.array([60.0, 60.0, W / 2, H / 2], np.float32)
c2w = np.eye(4, dtype=np.float32)
num_ids = grid.num_voxels + 1
t0 = time.time()
sums, counts = lift_view(feats, np.asarray(occ), c2w, intr, o2, vs, num_ids, depth_max=4.0)
counts_np = np.asarray(counts)
print("lift: %d/%d voxels hit, %d pixels landed (%.2fs incl compile)"
      % (int((counts_np[1:] > 0).sum()), grid.num_voxels, int(counts_np.sum()), time.time() - t0))
assert (counts_np[1:] > 0).sum() > 50, "lifting should hit many voxels"
avg = mean_features(sums, counts)

save_voxel_features(os.path.join(tmp, "vox.pt"), np.asarray(grid.centers()),
                    np.asarray(avg)[1:][:grid.num_voxels], np.asarray(grid.coords))
d = load_voxel_features(os.path.join(tmp, "vox.pt"))
print("artifact roundtrip:", d["pos"].shape, d["feat"].dtype)
g2v = nearest_neighbor_index(jnp.asarray(pts[:1000]), jnp.asarray(np.asarray(grid.centers())))
print("1-NN map:", np.asarray(g2v).shape, "max idx", int(np.asarray(g2v).max()))

s = initial_log_scales(pts[:2000])
print("knn scale init:", np.asarray(s).shape, "mean", float(np.asarray(s).mean()))

# probes
open(os.path.join(tmp, "bad.ply"), "w").write("not a ply at all")
try:
    read_voxel_grid_ply(os.path.join(tmp, "bad.ply"))
    print("PROBE-FAIL: bad ply accepted")
except ValueError as e:
    print("probe bad-ply -> ValueError:", e)
write_voxel_grid_ply(os.path.join(tmp, "nometa.ply"), c[:5], np.zeros((5, 3)), 0.1, np.zeros(3))
txt = open(os.path.join(tmp, "nometa.ply")).read().splitlines()
open(os.path.join(tmp, "nometa2.ply"), "w").write(
    "\n".join(l for l in txt if not l.startswith("comment")) + "\n")
cc, _, vs2, or2, sh2 = read_voxel_grid_ply(os.path.join(tmp, "nometa2.ply"))
print("probe no-meta ply -> voxel_size:", vs2, "origin:", or2)
c2w_away = np.eye(4, dtype=np.float32)
c2w_away[:3, :3] = np.diag([1, -1, -1])
s0, c0 = lift_view(feats, np.asarray(occ), c2w_away, intr, o2, vs, num_ids, depth_max=4.0)
print("probe camera-away -> hits:", int(np.asarray(c0).sum()))
print("ALL OK")

# ── rasterizer / renderer drive (added with the rasterizer milestone) ──────────
import dataclasses
from segsplat_tpu.core.types import Camera, GaussianTable
from segsplat_tpu.render import render, render_semantics

cap = 4096
t = GaussianTable.empty(cap, max_sh_degree=3)
ng = 2000
gx = np.column_stack([rng.uniform(-0.6, 0.6, ng), rng.uniform(-0.6, 0.6, ng),
                      rng.uniform(1.0, 2.5, ng)]).astype(np.float32)
fdc = np.zeros((cap, 1, 3), np.float32); fdc[:ng] = rng.normal(size=(ng, 1, 3))
obj = np.zeros((cap, 1, 16), np.float32); obj[:ng] = rng.normal(size=(ng, 1, 16))
act = np.zeros(cap, bool); act[:ng] = True
xyz = np.zeros((cap, 3), np.float32); xyz[:ng] = gx
t = dataclasses.replace(t, xyz=jnp.asarray(xyz), features_dc=jnp.asarray(fdc),
                        scaling=jnp.full((cap, 3), np.log(0.02), jnp.float32),
                        opacity=jnp.full((cap, 1), 1.0, jnp.float32),
                        objects_dc=jnp.asarray(obj), active=jnp.asarray(act))
cam = Camera(R=jnp.eye(3), T=jnp.zeros(3), fov_x=jnp.array(1.2), fov_y=jnp.array(1.0),
             width=320, height=240)
t0 = time.time()
out = render(t, cam, jnp.zeros(3))
out["render"].block_until_ready()
print("render: rgb", out["render"].shape, "objects", out["render_object"].shape,
      "visible", int(out["visibility_filter"].sum()), "(%.1fs incl compile)" % (time.time() - t0))
assert float(jnp.abs(out["render"]).sum()) > 0
logits = jnp.asarray(rng.normal(size=(cap, 20)).astype(np.float32))
t0 = time.time()
sem = render_semantics(t, cam, logits)
sem.block_until_ready()
print("semantics:", sem.shape, "argmax classes:",
      np.unique(np.asarray(jnp.argmax(sem[:20], 0))).size, "(%.1fs incl compile)" % (time.time() - t0))
# probe: camera inside the splat cloud pointing backwards still renders (bg only)
cam_back = Camera(R=jnp.asarray(np.diag([1.0, -1.0, -1.0]).astype(np.float32)),
                  T=jnp.zeros(3), fov_x=jnp.array(1.2), fov_y=jnp.array(1.0),
                  width=320, height=240)
ob = render(t, cam_back, jnp.ones(3))
print("probe backwards-camera: visible =", int(ob["visibility_filter"].sum()),
      "mean rgb =", float(ob["render"].mean()))
print("RENDER OK")

# ── texture inpainting (ops/inpaint_patch.py — the LaMa-substitute fill) ──
from segsplat_tpu.ops.inpaint_patch import inpaint_texture

xx2 = np.arange(48)[None, :].repeat(48, axis=0)
tex = (0.5 + 0.45 * np.sin(xx2 * (2 * np.pi / 8))).astype(np.float32)
tex = np.stack([tex, tex * 0.8, 1 - tex], axis=-1)
hole2 = np.zeros((48, 48), bool); hole2[18:30, 18:30] = True
t0 = time.time()
fill = inpaint_texture(tex, hole2, pm_iters=4, em_iters=2, seed=0)
err = float(np.abs(fill - tex)[hole2].mean())
print("inpaint: texture MAE %.4f (%.1fs incl compile)" % (err, time.time() - t0))
assert err < 0.05
assert (fill[~hole2] == tex[~hole2]).all()
print("INPAINT OK")
