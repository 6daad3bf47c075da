"""Held-out view evaluation: PSNR / SSIM per camera.

The reference computes no image metrics anywhere (SURVEY.md section 0 --
its notebooks only eyeball renders); this is the standard novel-view
benchmark protocol (PSNR + SSIM on held-out cameras) used to score 3DGS
scenes, running the same tiled Pallas renderer as training.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from intro_to_gaussian_splatting_tpu.config import RasterizerConfig
from intro_to_gaussian_splatting_tpu.models.camera import Camera
from intro_to_gaussian_splatting_tpu.models.gaussians import GaussianModel
from intro_to_gaussian_splatting_tpu.ops.rasterize_pallas import render_tiled
from intro_to_gaussian_splatting_tpu.train.loss import psnr as psnr_fn
from intro_to_gaussian_splatting_tpu.train.loss import ssim as ssim_fn


def evaluate(
    model: GaussianModel,
    cameras: Sequence[Camera],
    targets: Sequence[np.ndarray],
    rcfg: RasterizerConfig = RasterizerConfig(),
    active_sh_degree: Optional[int] = None,
    interpret: Optional[bool] = None,
    names: Optional[Sequence[str]] = None,
) -> List[Dict]:
    """Render every camera and score it against its ground truth.

    Returns one dict per view: {name, psnr, ssim, overflowed, height,
    width} plus a final summary row {name: "mean", psnr, ssim} averaging
    the views. Metrics are computed on device in one jit (render + PSNR +
    SSIM) so only three scalars come back per view, each through
    utils.fetch.host_fetch_scalar -- a DIRECT device->host transfer
    (``float(x)``) blocks forever on tunneled TPU transports.

    ``overflowed`` reports whether the pair pool truncated gaussians for
    that view (rcfg.pairs_per_gaussian too small -- e.g. a densified model
    evaluated with the default pool): the PSNR/SSIM of an overflowed view
    under-counts far gaussians and should not be trusted.
    """
    import functools

    import jax.numpy as jnp

    from intro_to_gaussian_splatting_tpu.utils.fetch import host_fetch_scalar

    @functools.partial(jax.jit, static_argnames=("rcfg", "sh_deg",
                                                 "interpret"))
    def render_and_score(model, cam, target, rcfg, sh_deg, interpret):
        img, aux = render_tiled(model, cam, rcfg, active_sh_degree=sh_deg,
                                interpret=interpret, return_aux=True)
        img = jnp.clip(img, 0.0, 1.0)
        return (psnr_fn(img, target), ssim_fn(img, target),
                aux["overflowed"])

    rows: List[Dict] = []
    ps, ss = [], []
    for i, (cam, target) in enumerate(zip(cameras, targets)):
        t = jnp.asarray(np.asarray(target, dtype=np.float32))
        p, s, ovf = render_and_score(model, cam, t, rcfg,
                                     active_sh_degree, interpret)
        p, s = host_fetch_scalar(p), host_fetch_scalar(s)
        ovf = bool(host_fetch_scalar(ovf) > 0)
        ps.append(p)
        ss.append(s)
        rows.append(dict(
            name=(names[i] if names else f"view_{i}"),
            psnr=p, ssim=s, overflowed=ovf,
            height=cam.height, width=cam.width))
    if rows:
        rows.append(dict(name="mean", psnr=float(np.mean(ps)),
                         ssim=float(np.mean(ss))))
    return rows


def render_views(
    model: GaussianModel,
    cameras: Sequence[Camera],
    rcfg: RasterizerConfig = RasterizerConfig(),
    active_sh_degree: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> List[np.ndarray]:
    """Render every camera; returns float32 (H, W, 3) images in [0, 1]."""
    out = []
    for cam in cameras:
        img = render_tiled(model, cam, rcfg,
                           active_sh_degree=active_sh_degree,
                           interpret=interpret)
        out.append(np.clip(np.asarray(img), 0.0, 1.0))
    return out
