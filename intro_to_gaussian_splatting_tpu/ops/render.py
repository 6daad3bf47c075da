"""High-level render entry point with backend dispatch.

Functional replacement for ``GaussianScene.render_image`` /
``render_image_cuda`` (splat/gaussian_scene.py:200-285). Backends:

  * "dense":  pure-JAX all-pairs compositing (oracle; O(pixels*N))
  * "pallas": tile-binned Pallas TPU kernel (production path)
  * "auto":   pallas when the pipeline is available, else dense
"""

from __future__ import annotations

from typing import Optional

import jax

from intro_to_gaussian_splatting_tpu.config import RasterizerConfig
from intro_to_gaussian_splatting_tpu.models.camera import Camera
from intro_to_gaussian_splatting_tpu.models.gaussians import GaussianModel
from intro_to_gaussian_splatting_tpu.ops.compositing import render_dense


def render(
    model: GaussianModel,
    camera: Camera,
    config: RasterizerConfig = RasterizerConfig(),
    backend: str = "auto",
    active_sh_degree: Optional[int] = None,
) -> jax.Array:
    """Render (height, width, 3)."""
    if backend == "auto":
        try:
            from intro_to_gaussian_splatting_tpu.ops import rasterize_pallas  # noqa
            backend = "pallas"
        except ImportError:
            backend = "dense"
    if backend == "dense":
        return render_dense(model, camera, config,
                            active_sh_degree=active_sh_degree)
    if backend == "pallas":
        from intro_to_gaussian_splatting_tpu.ops.rasterize_pallas import (
            render_tiled,
        )
        return render_tiled(model, camera, config,
                            active_sh_degree=active_sh_degree)
    raise ValueError(f"unknown backend {backend!r}")
