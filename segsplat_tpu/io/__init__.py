from segsplat_tpu.io.ply import (
    PlyContent,
    read_ply,
    write_ply,
    read_voxel_grid_ply,
    write_voxel_grid_ply,
    save_gaussian_ply,
    load_gaussian_ply,
)
