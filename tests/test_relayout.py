"""Pallas tile<->image relayout (ops/relayout_pallas.py) vs the XLA
untile_chw reference: bit-exact forward, exact adjoint, zero depth-channel
cotangent. Runs in interpret mode on the CPU platform; the same kernel is
exercised compiled inside the train step on TPU (bench.py gates)."""

import jax
import jax.numpy as jnp
import numpy as np

from intro_to_gaussian_splatting_tpu.ops.rasterize_pallas import (
    image_to_tiles, untile_chw,
)
from intro_to_gaussian_splatting_tpu.ops.relayout_pallas import (
    untile_chw_fast,
)
from intro_to_gaussian_splatting_tpu.config import RasterizerConfig


def _scene_shapes(w=84, h=52, ts=16, gt=4):
    ntx, nty = -(-w // ts), -(-h // ts)
    nt = ntx * nty
    ng = -(-nt // gt)
    return ntx, nty, nt, ng


def test_untile_fast_matches_xla():
    w, h, ts, gt = 84, 52, 16, 4
    ntx, nty, nt, ng = _scene_shapes(w, h, ts, gt)
    rng = np.random.default_rng(0)
    tiles = jnp.asarray(rng.standard_normal((ng, 5, gt, ts * ts)),
                        jnp.float32)
    want = np.asarray(untile_chw(tiles[:, :3], ntx, nty, ts, h, w))
    got = np.asarray(untile_chw_fast(tiles[:, :4], ntx, nty, ts, h, w,
                                     True))
    np.testing.assert_array_equal(got, want)


def test_untile_fast_gradient_is_exact_adjoint():
    w, h, ts, gt = 84, 52, 16, 4
    ntx, nty, nt, ng = _scene_shapes(w, h, ts, gt)
    rng = np.random.default_rng(1)
    tiles = jnp.asarray(rng.standard_normal((ng, 4, gt, ts * ts)),
                        jnp.float32)
    cot = jnp.asarray(rng.standard_normal((3, h, w)), jnp.float32)

    # pallas-vjp gradient == XLA autodiff gradient of the same map
    def f_fast(t):
        return jnp.vdot(untile_chw_fast(t, ntx, nty, ts, h, w, True), cot)

    def f_xla(t):
        return jnp.vdot(untile_chw(t[:, :3], ntx, nty, ts, h, w), cot)

    g_fast = np.asarray(jax.grad(f_fast)(tiles))
    g_xla = np.asarray(jax.grad(f_xla)(tiles))
    np.testing.assert_array_equal(g_fast, g_xla)
    # the alignment-only depth channel gets an exactly-zero cotangent
    assert np.all(g_fast[:, 3] == 0.0)


def test_untile_fast_roundtrip_with_image_to_tiles():
    """untile(tile(img)) == img at a non-multiple-of-16 resolution."""
    w, h, ts, gt = 84, 52, 16, 4
    ntx, nty, nt, ng = _scene_shapes(w, h, ts, gt)
    cfg = RasterizerConfig(tile_size=ts, group_tiles=gt)
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.standard_normal((h, w, 3)), jnp.float32)
    tiles = image_to_tiles(img, cfg)                 # (NG, 3, GT, ts*ts)
    tiles4 = jnp.pad(tiles, ((0, 0), (0, 1), (0, 0), (0, 0)))
    out = np.asarray(untile_chw_fast(tiles4, ntx, nty, ts, h, w, True))
    np.testing.assert_allclose(out, np.asarray(img).transpose(2, 0, 1),
                               atol=0)
