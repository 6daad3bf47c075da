"""TPU-native differentiable 3D Gaussian splatting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
repo ``dcaustin33/intro_to_gaussian_splatting`` (COLMAP scene load, EWA
projection, tile binning, front-to-back alpha compositing), extended with the
pieces the reference lacks: a hand-derived backward pass, spherical-harmonic
colors, an Adam + densify/prune training loop, checkpointing, and multi-chip
sharding via ``shard_map`` over a ``jax.sharding.Mesh``.

Layering (bottom-up), mirroring SURVEY.md section 1:
  io/        COLMAP + PLY parsing, synthetic scenes      (ref: splat/read_colmap.py)
  models/    Camera + Gaussian pytrees, SH colors        (ref: splat/image.py, splat/gaussians.py)
  ops/       projection, binning, rasterization kernels  (ref: splat/gaussian_scene.py, splat/c/render.cu)
  train/     loss, Adam loop, densification, checkpoints (absent in reference)
  parallel/  mesh + shard_map render/train steps         (absent in reference)
  utils/     metrics, profiling
"""

__version__ = "0.1.0"

from intro_to_gaussian_splatting_tpu.config import (
    CompatConfig,
    RasterizerConfig,
    TrainConfig,
)

__all__ = [
    "CompatConfig",
    "RasterizerConfig",
    "TrainConfig",
]
