"""Golden-artifact parity tests (VERDICT round-1 item #4): the framework's JAX
stage outputs, written in the reference's exact file formats, must diff clean
against the checked-in numpy-oracle goldens (tests/golden/, produced by
tests/make_goldens.py) through eval/parity.py — the same harness a user points
at real reference-produced artifacts."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tests.make_goldens import (CHANNELS, DEPTH_MAX, DEPTH_MIN, GOLD_DIR,
                                PROMPTS, hash_prompt_embeddings, id_coords,
                                scene_inputs)


@pytest.fixture(scope="module")
def framework_artifacts(tmp_path_factory):
    """Regenerate every golden artifact through the framework's JAX paths."""
    import jax.numpy as jnp

    from segsplat_tpu.io.artifacts import (save_label_map, save_semantics,
                                           save_voxel_features)
    from segsplat_tpu.io.ply import write_voxel_grid_ply
    from segsplat_tpu.models.clip_text import project_features_to_labels
    from segsplat_tpu.ops.lift import (default_max_steps, first_hit_voxels,
                                       scatter_features)

    out = tmp_path_factory.mktemp("parity_ours")
    occ, views, intr, origin, vs, W, H, feats = scene_inputs()
    coords = id_coords(occ)
    num_ids = coords.shape[0] + 1
    centers = (origin + coords * vs + vs / 2).astype(np.float32)

    inc = vs * 0.5
    steps = default_max_steps(W, H, intr[0], intr[1], DEPTH_MIN, DEPTH_MAX, inc)
    sums = jnp.zeros((num_ids, CHANNELS), jnp.float32)
    counts = jnp.zeros((num_ids,), jnp.int32)
    hits_all = []
    for i in range(len(views)):
        hits = first_hit_voxels(jnp.asarray(occ), jnp.asarray(views[i]),
                                jnp.asarray(intr), jnp.asarray(origin),
                                jnp.asarray(vs, jnp.float32), DEPTH_MIN,
                                DEPTH_MAX, jnp.asarray(inc, jnp.float32),
                                W, H, steps)
        s, c = scatter_features(jnp.asarray(feats[i]), hits, num_ids)
        sums, counts = sums + s, counts + c
        hits_all.append(np.asarray(hits))

    counts = np.asarray(counts)
    sums = np.asarray(sums)
    nzm = counts[1:] > 0
    mean = np.zeros_like(sums[1:])
    mean[nzm] = sums[1:][nzm] / counts[1:][nzm, None]

    vox_pt = str(out / "voxel_features.pt")
    save_voxel_features(vox_pt, xyz=centers[nzm], avg_feats=mean[nzm],
                        voxel_coords=coords[nzm][:, ::-1])

    emb = hash_prompt_embeddings(PROMPTS, CHANNELS)
    logits = np.asarray(project_features_to_labels(
        jnp.asarray(mean[nzm]), jnp.asarray(emb),
        jnp.asarray(np.exp(np.log(1 / 0.07)), jnp.float32)))
    labels = logits.argmax(axis=1).astype(np.int64)
    sem_npz = str(out / "semantics.npz")
    save_semantics(sem_npz, labels=labels, logits=logits, prompts=PROMPTS)

    id_to_label = np.full((num_ids,), 255, np.int64)
    id_to_label[1:][nzm] = labels
    for i, hits in enumerate(hits_all):
        save_label_map(str(out / f"view{i:02d}_labels.pt"), id_to_label[hits])

    heat = np.clip(counts[1:] / max(counts.max(), 1), 0, 1)
    cols = np.stack([255 * heat, 64 + 0 * heat, 255 * (1 - heat)],
                    axis=1).astype(np.uint8)
    grid_ply = str(out / "grid.ply")
    write_voxel_grid_ply(grid_ply, centers, cols, float(vs), origin,
                         grid_shape=occ.shape[::-1])
    return dict(dir=str(out), vox_pt=vox_pt, sem_npz=sem_npz,
                grid_ply=grid_ply)


def _assert_ok(reports):
    for r in reports:
        print(r.line())
    assert all(r.ok for r in reports), [r.line() for r in reports if not r.ok]


def test_goldens_checked_in():
    for f in ("golden_voxel_features.pt", "golden_semantics.npz",
              "golden_grid.ply", "view00_labels.pt"):
        assert os.path.exists(os.path.join(GOLD_DIR, f)), f


def test_parity_voxel_features(framework_artifacts):
    from segsplat_tpu.eval.parity import compare_voxel_features

    _assert_ok(compare_voxel_features(
        framework_artifacts["vox_pt"],
        os.path.join(GOLD_DIR, "golden_voxel_features.pt")))


def test_parity_semantics(framework_artifacts):
    from segsplat_tpu.eval.parity import compare_semantics

    _assert_ok(compare_semantics(
        framework_artifacts["sem_npz"],
        os.path.join(GOLD_DIR, "golden_semantics.npz")))


def test_parity_label_maps(framework_artifacts):
    from segsplat_tpu.eval.parity import compare_label_maps

    reports = compare_label_maps(framework_artifacts["dir"], GOLD_DIR)
    assert len(reports) == 3
    _assert_ok(reports)


def test_parity_voxel_grid(framework_artifacts):
    from segsplat_tpu.eval.parity import compare_voxel_grids

    _assert_ok(compare_voxel_grids(
        framework_artifacts["grid_ply"],
        os.path.join(GOLD_DIR, "golden_grid.ply")))


def test_parity_cli_exit_codes(framework_artifacts):
    """The parity CLI (eval/parity.py main) exits 0 on clean diffs."""
    from segsplat_tpu.eval import parity

    with pytest.raises(SystemExit) as e:
        parity.main(["voxel_features", framework_artifacts["vox_pt"],
                     os.path.join(GOLD_DIR, "golden_voxel_features.pt")])
    assert e.value.code == 0
