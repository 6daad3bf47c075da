"""Shared synthetic scene builders for tests: construct the same small scene
both as our pytrees and as reference (torch) objects."""

import numpy as np
import jax.numpy as jnp

from intro_to_gaussian_splatting_tpu.io.synthetic import ring_cameras
from intro_to_gaussian_splatting_tpu.models.camera import make_camera
from intro_to_gaussian_splatting_tpu.models.gaussians import GaussianModel


def small_scene(
    n: int = 60,
    width: int = 32,
    height: int = 32,
    seed: int = 7,
    scale_lo: float = 0.02,
    scale_hi: float = 0.25,
    opacity_lo: float = -2.0,
    opacity_hi: float = 4.0,
):
    """Random gaussians in front of a ring camera; returns (dict, Camera, model)."""
    rng = np.random.default_rng(seed)
    (qvec, tvec) = ring_cameras(1, width, height, radius=5.0, z=1.0, seed=seed)[0]
    pts = rng.normal(0.0, 1.2, size=(n, 3))
    colors = rng.uniform(0.0, 1.0, size=(n, 3))
    scales = rng.uniform(scale_lo, scale_hi, size=(n, 3))
    quats = rng.normal(size=(n, 4))
    opacity_logits = rng.uniform(opacity_lo, opacity_hi, size=(n,))
    focal = 0.9 * max(width, height)

    cam = make_camera(fx=focal, fy=focal, width=width, height=height,
                      qvec=qvec, tvec=tvec)
    model = GaussianModel(
        means=jnp.asarray(pts, dtype=jnp.float32),
        log_scales=jnp.log(jnp.asarray(scales, dtype=jnp.float32)),
        quats=jnp.asarray(quats, dtype=jnp.float32),
        opacity_logits=jnp.asarray(opacity_logits, dtype=jnp.float32),
        sh=jnp.asarray(colors, dtype=jnp.float32)[:, None, :],
        active=jnp.ones((n,), dtype=bool),
        color_space="rgb",
    )
    raw = dict(points=pts, colors=colors, scales=scales, quats=quats,
               opacity_logits=opacity_logits, qvec=qvec, tvec=tvec,
               focal=focal, width=width, height=height)
    return raw, cam, model


def reference_scene(splat, raw):
    """Build the same scene as reference torch objects.

    Constructs Gaussians/GaussianScene via __new__ to skip their __init__
    side effects (PLY writes, COLMAP file reads) -- attribute layout is plain
    tensors (ref gaussians.py has no super().__init__, SURVEY.md quirk 5)."""
    import torch
    from splat.read_colmap import Camera as RefCamera, Image as RefImage

    n = len(raw["points"])
    g = splat.gaussians.Gaussians.__new__(splat.gaussians.Gaussians)
    g.device = torch.device("cpu")
    g.points = torch.tensor(raw["points"], dtype=torch.float32)
    g.colors = torch.tensor(raw["colors"], dtype=torch.float32)
    g.scales = torch.tensor(raw["scales"], dtype=torch.float32)
    g.quaternions = torch.tensor(raw["quats"], dtype=torch.float32)
    g.opacity = torch.tensor(raw["opacity_logits"], dtype=torch.float32).reshape(n, 1)

    w, h, f = raw["width"], raw["height"], raw["focal"]
    ref_cam = RefCamera(id=1, model="PINHOLE", width=w, height=h,
                        params=np.array([f, f, w / 2, h / 2]))
    ref_im = RefImage(id=1, qvec=raw["qvec"], tvec=raw["tvec"], camera_id=1,
                      name="x", xys=np.zeros((0, 2)), point3D_ids=np.zeros(0))
    gi = splat.image.GaussianImage(camera=ref_cam, image=ref_im)

    scene = splat.gaussian_scene.GaussianScene.__new__(
        splat.gaussian_scene.GaussianScene)
    torch.nn.Module.__init__(scene)  # skip file IO, keep Module machinery
    scene.images = {0: gi}
    scene.gaussians = g
    return scene
