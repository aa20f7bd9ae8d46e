"""segsplat_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for open-vocabulary
semantic novel-view synthesis with 3D Gaussians.

This is the "3d-semantic-segmentation_tpu" framework: a ground-up rebuild of the
capabilities of the reference CUDA/PyTorch pipeline (gabormarko/3D-semantic-segmentation)
designed TPU-first:

  * all device compute is JAX/XLA/Pallas (no torch on the compute path; torch-cpu is
    used only for `.pt` artifact file compatibility),
  * deterministic segment reductions replace CUDA atomics,
  * static-capacity Gaussian tables replace dynamic tensor growth,
  * multi-chip scale-out is expressed with `jax.sharding.Mesh` + `shard_map` and XLA
    collectives over ICI (the reference is single-GPU and has none of this).

Layer map (mirrors SURVEY.md §7):
  core/      pytree types, camera/projection math, spherical harmonics
  io/        PLY (incl. voxel-grid header-comment metadata), COLMAP, .pt/.npz artifacts
  ops/       kernels: voxelize, knn, 2D→3D feature lifting, N-channel tile rasterizer
  models/    LSeg/CLIP text+image encoders (Flax) and the identity-feature codebook
  train/     Unified-Lift training loop (optax), densification under static shapes
  parallel/  device-mesh sharding: view-parallel lifting, DP training, image-space render
  pipeline/  the five stage entry points, chained in-process
  eval/      mIoU/fwIoU, IoU/Boundary-IoU, PSNR/SSIM
  utils/     config, palettes, logging
"""

__version__ = "0.1.0"
