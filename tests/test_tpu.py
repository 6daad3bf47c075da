"""Compiled-Mosaic vs interpret parity on REAL TPU hardware.

Every parity test in test_rasterize_pallas.py runs the Pallas kernels with
``interpret=True``; this module is the missing gate: it executes the
compiled kernels on the actual chip and asserts pixels AND gradients match
interpret mode and the dense oracle. The reference's only hardware safety
check is ``checkAllSameGPU`` (/root/reference/splat/c/render.cu:104-112);
this is the TPU answer to the SURVEY §5 "race detection / sanitizer" row.

Run with: ``GSTPU_TPU_TESTS=1 python -m pytest tests/test_tpu.py -v``
(the default CPU test session self-skips these).

All comparisons are computed ON DEVICE and only scalar diffs are fetched
via utils.fetch.host_fetch -- direct device->host transfers block through
tunneled TPU transports.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intro_to_gaussian_splatting_tpu.config import RasterizerConfig
from intro_to_gaussian_splatting_tpu.ops.compositing import render_dense
from intro_to_gaussian_splatting_tpu.ops.rasterize_pallas import (
    image_to_tiles,
    render_tiled,
    render_tiles,
    tile_pixel_mask,
)
from tests.scenes import small_scene

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="compiled-Mosaic parity needs real TPU hardware "
           "(GSTPU_TPU_TESTS=1 keeps the TPU backend)")

# Multi-chunk, multi-group workload: 512x384 = 32x24 tiles = 12 groups of
# 64; ~2k gaussians with generous scales produce a dense pair stream many
# chunks long, so cross-chunk transmittance carry, group overhang lanes,
# and the double-buffered DMA paths are all exercised compiled.
# pairs_per_gaussian sized for THIS scene (demands ~32k pairs; the default
# 4*N pool would overflow and drop far gaussians, so the pallas image would
# legitimately differ from the drop-free dense oracle)
CFG = RasterizerConfig(pairs_per_gaussian=32)
# The dense-workload variant bench.py publishes numbers for: small tile
# groups (one-hot matmul cost scales with group_tiles); same tolerances.
CFG_DENSE = RasterizerConfig(pairs_per_gaussian=32, group_tiles=16,
                             groups_per_step=16)
W, H, N = 512, 384, 2000


@pytest.fixture(scope="module")
def scene():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _, cam, model = small_scene(n=N, width=W, height=H, seed=11,
                                scale_lo=0.01, scale_hi=0.12)
    return cam, model


def _maxabs(x):
    return jnp.max(jnp.abs(x))


@pytest.mark.parametrize("cfg", [CFG, CFG_DENSE],
                         ids=["default", "gt16"])
def test_compiled_forward_matches_interpret_and_dense(scene, cfg):
    from intro_to_gaussian_splatting_tpu.utils.fetch import host_fetch
    cam, model = scene
    CFG = cfg
    compiled = render_tiles(model, cam, CFG, interpret=False)
    interp = render_tiles(model, cam, CFG, interpret=True)
    img_c = render_tiled(model, cam, CFG, interpret=False)
    dense = render_dense(model, cam, CFG)

    @jax.jit
    def diffs(compiled, interp, img_c, dense):
        return dict(
            ci=_maxabs(compiled - interp),
            cd=_maxabs(img_c - dense),
            mag=_maxabs(compiled),
        )

    d = host_fetch(diffs(compiled, interp, img_c, dense))
    assert np.isfinite(d["mag"]) and d["mag"] > 0.1, \
        f"degenerate scene (max |out| = {d['mag']})"
    assert d["ci"] < 1e-4, f"compiled vs interpret max diff {d['ci']}"
    assert d["cd"] < 2e-3, f"compiled vs dense oracle max diff {d['cd']}"


def test_compiled_ssim_matches_interpret(scene):
    """Fused SSIM kernel (banded, double-buffered DMA) compiled vs
    interpret, values AND gradients, at a non-multiple-of-band height."""
    from intro_to_gaussian_splatting_tpu.ops.ssim_pallas import fused_ssim
    from intro_to_gaussian_splatting_tpu.utils.fetch import host_fetch

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    pred = jax.random.uniform(k1, (3, 403, 517), jnp.float32)
    target = jax.random.uniform(k2, (3, 403, 517), jnp.float32)

    def val_and_grad(interpret):
        f = lambda p: fused_ssim(p, target, interpret=interpret,
                                 grad_target=False)
        return jax.jit(jax.value_and_grad(f))(pred)

    vc, gc = val_and_grad(False)
    vi, gi = val_and_grad(True)

    @jax.jit
    def diffs(vc, vi, gc, gi):
        return dict(v=jnp.abs(vc - vi), g=_maxabs(gc - gi),
                    gmag=_maxabs(gi), vmag=jnp.abs(vi))

    d = host_fetch(diffs(vc, vi, gc, gi))
    assert float(d["vmag"]) > 1e-3, "degenerate SSIM value"
    assert float(d["v"]) < 1e-5, f"SSIM value compiled vs interpret {d['v']}"
    assert float(d["g"]) < 1e-5 * max(float(d["gmag"]), 1e-3), \
        f"SSIM grad compiled vs interpret {d['g']}"


def test_compiled_fused_loss_matches_interpret(scene):
    """Fused tile-space photometric loss (merge + L1 + SSIM value+grad in
    one band pass) compiled vs interpret on the chip, at a ragged size
    (non-multiple-of-band height, non-multiple-of-8 tile columns)."""
    from intro_to_gaussian_splatting_tpu.ops.binning import (
        num_groups_for, tile_grid,
    )
    from intro_to_gaussian_splatting_tpu.ops.fused_loss_pallas import (
        fused_photometric_loss, pad_target_chw,
    )
    from intro_to_gaussian_splatting_tpu.utils.fetch import host_fetch

    h, w, ts = 403, 517, CFG.tile_size
    ntx, nty = tile_grid(w, h, ts)
    ng = num_groups_for(ntx * nty, CFG)
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    tiles = jax.random.uniform(k1, (ng, 3, CFG.group_tiles, ts * ts))
    target = jax.random.uniform(k2, (h, w, 3), jnp.float32)
    tpad = jax.jit(pad_target_chw, static_argnums=(1, 2, 3, 4, 5))(
        target, ntx, nty, ts, h, w)

    def lvg(interpret):
        def f(t):
            loss, mse = fused_photometric_loss(t, tpad, ntx, nty, ts, h, w,
                                               0.2, interpret)
            return loss, mse
        (l, m), g = jax.jit(jax.value_and_grad(f, has_aux=True))(tiles)
        return l, m, g

    lc, mc, gc = lvg(False)
    li, mi, gi = lvg(True)

    @jax.jit
    def diffs(lc, mc, gc, li, mi, gi):
        return dict(l=jnp.abs(lc - li), m=jnp.abs(mc - mi),
                    g=_maxabs(gc - gi), gmag=_maxabs(gi),
                    lmag=jnp.abs(li))

    d = host_fetch(diffs(lc, mc, gc, li, mi, gi))
    assert float(d["lmag"]) > 1e-3, "degenerate loss value"
    assert float(d["l"]) < 1e-5, f"fused loss compiled vs interpret {d['l']}"
    assert float(d["m"]) < 1e-5, f"fused mse compiled vs interpret {d['m']}"
    assert float(d["g"]) < 1e-5 * max(float(d["gmag"]), 1e-3), \
        f"fused grad compiled vs interpret {d['g']}"


@pytest.mark.parametrize("cfg", [CFG, CFG_DENSE],
                         ids=["default", "gt16"])
def test_compiled_backward_matches_interpret(scene, cfg):
    from intro_to_gaussian_splatting_tpu.utils.fetch import host_fetch
    cam, model = scene
    CFG = cfg
    mask = tile_pixel_mask(H, W, CFG)
    target = jnp.zeros((H, W, 3), jnp.float32)
    target_tiles = jax.jit(
        image_to_tiles, static_argnames="config")(target, CFG)

    def make_loss(interpret):
        def loss(params):
            tiles = render_tiles(model.replace(**params), cam, CFG,
                                 interpret=interpret)
            d = (tiles[:, :3] - target_tiles[:, :3]) * mask
            return jnp.sum(d * d)
        return loss

    params = model.params()
    g_c = jax.jit(jax.grad(make_loss(False)))(params)
    g_i = jax.jit(jax.grad(make_loss(True)))(params)

    @jax.jit
    def diffs(g_c, g_i):
        out = {}
        for k in g_c:
            out[k] = _maxabs(g_c[k] - g_i[k])
            out[k + "_mag"] = _maxabs(g_i[k])
        return out

    d = host_fetch(diffs(g_c, g_i))
    for k in params:
        mag = max(float(d[k + "_mag"]), 1e-3)
        assert float(d[k]) < 1e-3 * mag + 1e-5, \
            f"grad[{k}]: compiled vs interpret max diff {d[k]} (mag {mag})"
        assert np.isfinite(d[k + "_mag"]), f"grad[{k}] not finite"
    # gradients must actually be nonzero for the check to mean anything
    assert float(d["means_mag"]) > 0.0
