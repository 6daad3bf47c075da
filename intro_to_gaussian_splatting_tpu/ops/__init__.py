from intro_to_gaussian_splatting_tpu.ops.projection import (
    ProjectedGaussians,
    project_gaussians,
)
from intro_to_gaussian_splatting_tpu.ops.compositing import render_dense
from intro_to_gaussian_splatting_tpu.ops.binning import TileBins, bin_gaussians
from intro_to_gaussian_splatting_tpu.ops.points import (
    project_points,
    render_points_image,
)

__all__ = [
    "ProjectedGaussians",
    "project_gaussians",
    "render_dense",
    "TileBins",
    "bin_gaussians",
    "project_points",
    "render_points_image",
]
