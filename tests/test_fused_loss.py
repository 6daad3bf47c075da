"""Parity tests: fused tile-space photometric loss vs the split path.

The split reference is exactly what train_step's legacy branch computes:
(1-w) * tile_l1 + w * (1 - fused_ssim(untile_chw(tiles))), with PSNR from
tile_psnr. The fused kernel must reproduce value, MSE and the gradient
w.r.t. the tile stream -- including zero gradient into pixels beyond the
true image bounds and into phantom padding tiles.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from intro_to_gaussian_splatting_tpu.config import RasterizerConfig
from intro_to_gaussian_splatting_tpu.ops.binning import (
    num_groups_for, tile_grid,
)
from intro_to_gaussian_splatting_tpu.ops.fused_loss_pallas import (
    fused_photometric_loss, pad_target_chw,
)
from intro_to_gaussian_splatting_tpu.ops.rasterize_pallas import (
    image_to_tiles, tile_pixel_mask, untile_chw,
)
from intro_to_gaussian_splatting_tpu.ops.ssim_pallas import fused_ssim
from intro_to_gaussian_splatting_tpu.train.loss import tile_l1, tile_psnr

CFG = RasterizerConfig(group_tiles=4, groups_per_step=2)


def _setup(h, w, seed=0):
    rng = np.random.default_rng(seed)
    ts = CFG.tile_size
    ntx, nty = tile_grid(w, h, ts)
    ng = num_groups_for(ntx * nty, CFG)
    target = jnp.asarray(rng.uniform(0, 1, (h, w, 3)), jnp.float32)
    pred_img = jnp.asarray(
        np.clip(np.asarray(target)
                + rng.normal(0, 0.15, (h, w, 3)), 0, 1.2), jnp.float32)
    tiles = image_to_tiles(pred_img, CFG)                  # (NG, 3, GT, pix)
    # junk everywhere outside the true image: pixels beyond (h, w) inside
    # real tiles AND whole phantom padding tiles must not affect anything
    mask3 = jnp.broadcast_to(tile_pixel_mask(h, w, CFG), tiles.shape)
    junk = jnp.asarray(rng.uniform(-3, 3, tiles.shape), jnp.float32)
    tiles = tiles * mask3 + junk * (1.0 - mask3)
    return ntx, nty, ts, ng, target, tiles


def _split_loss(tiles3, target, target_tiles, mask, ntx, nty, ts, h, w,
                wt):
    l1 = tile_l1(tiles3, target_tiles, mask)
    img = untile_chw(tiles3, ntx, nty, ts, h, w)
    s = fused_ssim(img, jnp.transpose(target, (2, 0, 1)),
                   grad_target=False)
    return (1.0 - wt) * l1 + wt * (1.0 - s)


@pytest.mark.parametrize("h,w", [(75, 90), (64, 128)])
def test_fused_loss_matches_split_path(h, w):
    wt = 0.2
    ntx, nty, ts, ng, target, tiles = _setup(h, w)
    target_tiles = image_to_tiles(target, CFG)
    mask = tile_pixel_mask(h, w, CFG)
    tpad = pad_target_chw(target, ntx, nty, ts, h, w)

    def fused(t):
        loss, mse = fused_photometric_loss(t, tpad, ntx, nty, ts, h, w,
                                           wt, True)
        return loss, mse

    def split(t):
        return _split_loss(t, target, target_tiles, mask, ntx, nty, ts,
                           h, w, wt)

    lf, gf = jax.value_and_grad(lambda t: fused(t)[0])(tiles)
    ls, gs = jax.value_and_grad(split)(tiles)
    assert float(lf) == pytest.approx(float(ls), rel=1e-5, abs=1e-7)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gs),
                               rtol=1e-4, atol=1e-8)

    # PSNR parity: mse matches tile_psnr's mean squared error
    _, mse = fused(tiles)
    psnr_fused = -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
    psnr_ref = tile_psnr(tiles, target_tiles, mask)
    assert float(psnr_fused) == pytest.approx(float(psnr_ref), abs=1e-4)


def test_fused_loss_masks_out_of_bounds_gradient():
    h, w = 75, 90
    wt = 0.3
    ntx, nty, ts, ng, target, tiles = _setup(h, w, seed=3)
    tpad = pad_target_chw(target, ntx, nty, ts, h, w)
    g = jax.grad(lambda t: fused_photometric_loss(
        t, tpad, ntx, nty, ts, h, w, wt, True)[0])(tiles)
    mask3 = jnp.broadcast_to(tile_pixel_mask(h, w, CFG), tiles.shape)
    outside = np.asarray(g * (1.0 - mask3))
    assert np.abs(outside).max() == 0.0
    inside = np.asarray(g * mask3)
    assert np.abs(inside).max() > 0.0


def test_train_step_fused_matches_split_path():
    """The trainer's fused-loss branch must optimize identically to the
    split branch: same per-step loss/PSNR and same updated model."""
    from intro_to_gaussian_splatting_tpu.config import TrainConfig
    from intro_to_gaussian_splatting_tpu.ops.rasterize_pallas import (
        render_tiled,
    )
    from intro_to_gaussian_splatting_tpu.train.trainer import Trainer
    from tests.scenes import small_scene

    rcfg = RasterizerConfig(chunk_size=128, pairs_per_gaussian=32,
                            group_tiles=2)
    raw, cam, true_model = small_scene(n=30, width=48, height=32, seed=11,
                                       scale_lo=0.08, scale_hi=0.3)
    target = np.asarray(render_tiled(true_model, cam, rcfg, interpret=True))
    noisy = true_model.replace(opacity_logits=true_model.opacity_logits - 1.0)

    hists = {}
    models = {}
    for fused in (True, False):
        tcfg = TrainConfig(iterations=3, densify_start=10 ** 9,
                           opacity_reset_interval=0, ssim_weight=0.2,
                           fused_loss=fused)
        tr = Trainer(model=noisy, cameras=[cam], targets=[target.copy()],
                     scene_extent=1.0, rcfg=rcfg, tcfg=tcfg, log_every=1)
        hists[fused] = tr.run(3)
        models[fused] = tr.model
    for a, b in zip(hists[True], hists[False]):
        assert a["loss"] == pytest.approx(b["loss"], rel=1e-4, abs=1e-7)
        assert a["psnr"] == pytest.approx(b["psnr"], rel=1e-4)
    np.testing.assert_allclose(np.asarray(models[True].means),
                               np.asarray(models[False].means),
                               rtol=1e-4, atol=1e-7)


def test_fused_loss_value_and_grad_cotangent_scaling():
    """The VJP must scale the precomputed gradient by the loss cotangent."""
    h, w = 64, 64
    ntx, nty, ts, ng, target, tiles = _setup(h, w, seed=5)
    tpad = pad_target_chw(target, ntx, nty, ts, h, w)

    def f(t, scale):
        loss, _ = fused_photometric_loss(t, tpad, ntx, nty, ts, h, w,
                                         0.2, True)
        return loss * scale

    g1 = jax.grad(f)(tiles, 1.0)
    g3 = jax.grad(f)(tiles, 3.0)
    np.testing.assert_allclose(np.asarray(g3), 3.0 * np.asarray(g1),
                               rtol=1e-6)
