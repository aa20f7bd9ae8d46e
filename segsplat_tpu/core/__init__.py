from segsplat_tpu.core.types import Camera, GaussianTable, VoxelGrid
