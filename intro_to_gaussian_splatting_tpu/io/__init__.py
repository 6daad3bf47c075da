from intro_to_gaussian_splatting_tpu.io.colmap import (
    ColmapCamera,
    ColmapImage,
    ColmapPoints,
    read_cameras,
    read_images,
    read_points3D,
    read_model,
    write_cameras_binary,
    write_images_binary,
    write_points3D_binary,
)
from intro_to_gaussian_splatting_tpu.io.ply import read_ply, write_ply

__all__ = [
    "ColmapCamera",
    "ColmapImage",
    "ColmapPoints",
    "read_cameras",
    "read_images",
    "read_points3D",
    "read_model",
    "write_cameras_binary",
    "write_images_binary",
    "write_points3D_binary",
    "read_ply",
    "write_ply",
]
