"""Training losses and image metrics.

The reference has no loss/training of any kind (SURVEY.md section 0); this
implements the standard 3DGS objective: (1-w)*L1 + w*(1-SSIM), plus PSNR.
SSIM uses the standard 11x11 gaussian window as a depthwise convolution.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def l1(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - target))


def psnr(pred: jax.Array, target: jax.Array) -> jax.Array:
    mse = jnp.mean((pred - target) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


@functools.lru_cache(maxsize=None)
def _ssim_kernel1d(window: int, sigma: float):
    # cached as host numpy, NOT jnp: a jnp array built under an active trace
    # would cache a tracer and leak it into later jit calls
    import numpy as np
    ax = np.arange(window) - (window - 1) / 2.0
    g = np.exp(-(ax ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return g.astype(np.float32)


def _blur_chw(x: jax.Array, window: int, sigma: float) -> jax.Array:
    """Depthwise separable gaussian blur. x: (C, H, W), channel-MAJOR.

    Channel-major is load-bearing on TPU: an (H, W, 3) NHWC depthwise conv
    puts the 3-wide channel dim on the 128-lane minor axis, and XLA pads it
    ~43-85x (observed: a 96 MB image inflated to 8 GB of HLO temps, OOMing
    the chip at treehill scale). NCHW keeps W on lanes; two 1D taps replace
    the 11x11 window (separable kernel, 11x fewer FLOPs).
    """
    c = x.shape[0]
    k = _ssim_kernel1d(window, sigma)
    kh = jnp.broadcast_to(k[None, None, :, None], (c, 1, window, 1))
    kw = jnp.broadcast_to(k[None, None, None, :], (c, 1, 1, window))
    y = x[None]  # NCHW
    for kern in (kh, kw):
        y = jax.lax.conv_general_dilated(
            y, kern, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=c)
    return y[0]


def ssim_chw(pred: jax.Array, target: jax.Array,
             window: int = 11, sigma: float = 1.5,
             c1: float = 0.01 ** 2, c2: float = 0.03 ** 2,
             reduce: bool = True) -> jax.Array:
    """Mean SSIM over channel-major (C, H, W) images in [0, 1].

    ``reduce=False`` returns the per-window SSIM map
    (C, H-window+1, W-window+1) instead -- sharded training weights windows
    by validity across strip boundaries."""
    mu_x = _blur_chw(pred, window, sigma)
    mu_y = _blur_chw(target, window, sigma)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_x = _blur_chw(pred * pred, window, sigma) - mu_x2
    sigma_y = _blur_chw(target * target, window, sigma) - mu_y2
    sigma_xy = _blur_chw(pred * target, window, sigma) - mu_xy
    num = (2 * mu_xy + c1) * (2 * sigma_xy + c2)
    den = (mu_x2 + mu_y2 + c1) * (sigma_x + sigma_y + c2)
    smap = num / den
    return jnp.mean(smap) if reduce else smap


def ssim(pred: jax.Array, target: jax.Array,
         window: int = 11, sigma: float = 1.5,
         c1: float = 0.01 ** 2, c2: float = 0.03 ** 2) -> jax.Array:
    """Mean SSIM over (H, W, 3) images in [0, 1]."""
    return ssim_chw(pred.transpose(2, 0, 1), target.transpose(2, 0, 1),
                    window, sigma, c1, c2)


def rgb_loss(pred: jax.Array, target: jax.Array,
             ssim_weight: float = 0.2) -> jax.Array:
    """(1-w) * L1 + w * (1 - SSIM) -- the 3DGS photometric objective."""
    if ssim_weight == 0.0:
        return l1(pred, target)
    return ((1.0 - ssim_weight) * l1(pred, target)
            + ssim_weight * (1.0 - ssim(pred, target)))


def tile_l1(pred_tiles: jax.Array, target_tiles: jax.Array,
            mask_tiles: jax.Array) -> jax.Array:
    """Mean L1 in the rasterizer's native tile layout.

    pred_tiles: (NG, >=3, GT, PIX) raw rasterizer output; target/mask from
    ops.rasterize_pallas.image_to_tiles / tile_pixel_mask. Skipping the
    untile relayout here saves two ~200 MB transposes per training step.
    """
    diff = jnp.abs(pred_tiles[:, :3] - target_tiles[:, :3]) * mask_tiles
    return jnp.sum(diff) / (3.0 * jnp.sum(mask_tiles))


def tile_psnr(pred_tiles: jax.Array, target_tiles: jax.Array,
              mask_tiles: jax.Array) -> jax.Array:
    """PSNR in the tile layout; equals ``psnr`` on the untiled images
    (padded tiles are masked out of the mean)."""
    d2 = ((pred_tiles[:, :3] - target_tiles[:, :3]) ** 2) * mask_tiles
    mse = jnp.sum(d2) / (3.0 * jnp.sum(mask_tiles))
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
