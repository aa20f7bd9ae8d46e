"""Subprocess worker for tests/test_parallel_cli.py.

Runs ONE training configuration (view_batch, mesh_view) on the 8-virtual-
device CPU backend and saves the final Gaussian centers to an .npy.

Why a subprocess: building two differently-meshed parallel train programs in
one process trips a jax-runtime lifted-constant/buffer-aliasing quirk on the
CPU backend ("Execution supplied 47 buffers but compiled program expected
48") that real usage never hits — a run builds exactly one mesh. Isolating
each config in its own process matches production shape AND keeps the test
honest (it drives the public pipeline entry point end-to-end).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    scene, model_dir, view_batch, mesh_view, out_npy = sys.argv[1:6]

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from segsplat_tpu.pipeline.train import TrainRunConfig, train
    from segsplat_tpu.train.trainer import OptimizationConfig

    opt = OptimizationConfig(iterations=3, densify_from_iter=99,
                             densify_until_iter=0, num_classes=16)
    run = TrainRunConfig(iterations=3, test_iterations=(), save_iterations=(3,),
                         checkpoint_iterations=(), sh_up_every=99, log_every=1,
                         num_classes=16, raster_max_tiles_per_axis=4,
                         raster_max_per_tile=64, raster_tile_chunk=4,
                         view_batch=int(view_batch), mesh_view=int(mesh_view))
    state = train(scene, model_dir, opt=opt, run=run, capacity=96)
    np.save(out_npy, np.asarray(state.table.xyz))
    print(json.dumps({"ok": True, "out": out_npy}))


if __name__ == "__main__":
    main()
