"""Pallas tiled rasterizer vs the dense oracle: forward and gradients.

Runs in interpret mode on the CPU test platform; the same kernels compile
for real TPU (bench.py / test_tpu.py exercise that path on hardware).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intro_to_gaussian_splatting_tpu.config import CompatConfig, RasterizerConfig
from intro_to_gaussian_splatting_tpu.ops.compositing import render_dense
from intro_to_gaussian_splatting_tpu.ops.rasterize_pallas import render_tiled
from tests.scenes import small_scene

# small chunks so multi-chunk paths are exercised by tiny scenes
CFG = RasterizerConfig(chunk_size=128, pairs_per_gaussian=32, group_tiles=2)


def _render_both(n=80, width=48, height=32, seed=7, cfg=CFG, **kw):
    raw, cam, model = small_scene(n=n, width=width, height=height, seed=seed, **kw)
    dense = np.asarray(render_dense(model, cam, cfg))
    tiled = np.asarray(render_tiled(model, cam, cfg, interpret=True))
    return dense, tiled, (raw, cam, model)


def test_forward_matches_dense():
    dense, tiled, _ = _render_both()
    np.testing.assert_allclose(tiled, dense, rtol=1e-4, atol=1e-5)


def test_forward_matches_dense_many_gaussians():
    # enough gaussians per tile to force several chunks and early exit
    dense, tiled, _ = _render_both(n=400, seed=3, opacity_hi=6.0)
    np.testing.assert_allclose(tiled, dense, rtol=1e-4, atol=1e-5)


def test_forward_nonsquare_with_partial_tiles():
    dense, tiled, _ = _render_both(width=40, height=24, seed=5)
    np.testing.assert_allclose(tiled, dense, rtol=1e-4, atol=1e-5)


def test_forward_cuda_compat_mode():
    cfg = RasterizerConfig(chunk_size=128, pairs_per_gaussian=32, group_tiles=2,
                           compat=CompatConfig.REFERENCE_CUDA,
                           t_threshold=1e-3)
    dense, tiled, _ = _render_both(cfg=cfg)
    np.testing.assert_allclose(tiled, dense, rtol=1e-4, atol=1e-5)


def test_aux_outputs():
    raw, cam, model = small_scene(n=100, width=32, height=32, seed=2)
    img, aux = render_tiled(model, cam, CFG, return_aux=True, interpret=True)
    assert not bool(aux["overflowed"])
    alpha = np.asarray(aux["alpha"])
    T = np.asarray(aux["transmittance"])
    np.testing.assert_allclose(alpha + T, 1.0, atol=1e-6)  # by definition
    # Consistency against the dense oracle's EXACT final transmittance
    # Π(1-αᵢ): the tiled aux excludes only the sub-t_threshold tail, so
    # 1 - alpha must upper-bound the exact T within the tail mass bound
    # t_threshold / (1 - alpha_clamp).
    _, dense_aux = render_dense(model, cam, CFG, return_aux=True)
    T_exact = np.asarray(dense_aux["transmittance"])
    tail_bound = CFG.t_threshold / (1.0 - CFG.alpha_clamp)
    assert (T - T_exact >= -1e-5).all(), "aux transmittance under-counts"
    assert (T - T_exact <= tail_bound + 1e-5).all(), \
        f"excluded tail exceeds bound {tail_bound}"
    # alpha itself must match the oracle's accumulated weight
    np.testing.assert_allclose(alpha, np.asarray(dense_aux["alpha"]),
                               rtol=1e-4, atol=1e-5)
    depth = np.asarray(aux["depth"])
    np.testing.assert_allclose(depth, np.asarray(dense_aux["depth"]),
                               rtol=1e-4, atol=1e-5)
    assert (depth >= 0).all()


def test_gradients_match_dense_autodiff():
    """The hand-derived backward kernel vs autodiff of the dense oracle."""
    raw, cam, model = small_scene(n=60, width=32, height=32, seed=11)
    target = jnp.zeros((32, 32, 3))

    def loss_dense(params):
        img = render_dense(model.replace(**params), cam, CFG)
        return jnp.sum((img - target) ** 2)

    def loss_tiled(params):
        img = render_tiled(model.replace(**params), cam, CFG, interpret=True)
        return jnp.sum((img - target) ** 2)

    params = model.params()
    l_d, g_d = jax.value_and_grad(loss_dense)(params)
    l_t, g_t = jax.value_and_grad(loss_tiled)(params)
    np.testing.assert_allclose(float(l_t), float(l_d), rtol=1e-5)

    for name in ["means", "log_scales", "quats", "opacity_logits", "sh"]:
        a = np.asarray(g_d[name])
        b = np.asarray(g_t[name])
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(
            b, a, rtol=2e-3, atol=2e-4 * scale,
            err_msg=f"gradient mismatch for {name}")
        assert np.abs(b).sum() > 0, f"zero gradient for {name}"


def test_gradients_finite_differences():
    """Spot-check the full pipeline gradient against central differences."""
    raw, cam, model = small_scene(n=20, width=16, height=16, seed=4)

    def loss(means):
        img = render_tiled(model.replace(means=means), cam, CFG,
                           interpret=True)
        return jnp.sum(img)

    g = np.asarray(jax.grad(loss)(model.means))
    rng = np.random.default_rng(0)
    # pick a few coordinates with non-trivial gradient
    flat = np.abs(g).ravel()
    idxs = np.argsort(flat)[-5:]
    eps = 1e-3
    means = np.asarray(model.means)
    for idx in idxs:
        i, j = np.unravel_index(idx, g.shape)
        mp = means.copy(); mp[i, j] += eps
        mm = means.copy(); mm[i, j] -= eps
        fp = float(loss(jnp.asarray(mp)))
        fm = float(loss(jnp.asarray(mm)))
        fd = (fp - fm) / (2 * eps)
        assert np.isfinite(fd)
        np.testing.assert_allclose(g[i, j], fd, rtol=5e-2, atol=1e-3)


def test_overflow_flag():
    cfg = RasterizerConfig(chunk_size=128, pairs_per_gaussian=1, group_tiles=2)
    raw, cam, model = small_scene(n=200, width=32, height=32, seed=8)
    img, aux = render_tiled(model, cam, cfg, return_aux=True, interpret=True)
    assert bool(aux["overflowed"]), "tiny pair budget should overflow"


def test_tile_space_roundtrip_and_loss():
    """image_to_tiles is the exact inverse of untile, and the tile-space L1
    equals the image-space L1 (the training hot path skips untile)."""
    from intro_to_gaussian_splatting_tpu.ops.rasterize_pallas import (
        image_to_tiles, render_tiles, tile_pixel_mask, untile,
    )
    from intro_to_gaussian_splatting_tpu.ops.binning import tile_grid
    from intro_to_gaussian_splatting_tpu.train.loss import l1, tile_l1

    raw, cam, model = small_scene(n=80, width=40, height=24, seed=5)
    img = render_tiled(model, cam, CFG, interpret=True)
    tiles = render_tiles(model, cam, CFG, interpret=True)

    # roundtrip: tiling the untiled image reproduces the raw rasterizer
    # output wherever pixels are real
    mask = tile_pixel_mask(24, 40, CFG)
    retiled = image_to_tiles(img, CFG)
    np.testing.assert_allclose(
        np.asarray(retiled), np.asarray(tiles[:, :3] * mask), atol=1e-6)

    # untile of render_tiles matches render_tiled
    ntx, nty = tile_grid(40, 24, CFG.tile_size)
    img2 = untile(tiles[:, :3], ntx, nty, CFG.tile_size, 24, 40)
    np.testing.assert_allclose(np.asarray(img2), np.asarray(img), atol=1e-6)

    # tile-space L1 == image-space L1
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.uniform(0, 1, size=(24, 40, 3)), jnp.float32)
    a = float(l1(img, target))
    b = float(tile_l1(tiles, image_to_tiles(target, CFG), mask))
    np.testing.assert_allclose(b, a, rtol=1e-6)


def test_gather_pairs_vjp_matches_scatter_add():
    """The gather-only VJP of the pair gather (cumsum-diff over emission-
    contiguous blocks) must match the exact scatter-add reduction, including
    under adversarial same-sign values where running-sum rounding is worst."""
    from intro_to_gaussian_splatting_tpu.ops.binning import _gather_pairs

    rng = np.random.default_rng(3)
    n, mp = 3000, 65536
    counts = rng.integers(0, 9, size=n)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    total = int(min(offsets[-1], mp))
    lo = np.minimum(offsets[:-1], total).astype(np.int32)
    hi = np.minimum(offsets[1:], total).astype(np.int32)
    # emission-order gaussian ids, then a random "tile sort" permutation
    rank = np.zeros(mp, np.int32)
    for i in range(n):
        rank[lo[i]:hi[i]] = i
    perm = rng.permutation(mp).astype(np.int32)   # sorted slot -> emission
    inv_perm = np.argsort(perm).astype(np.int32)  # emission -> sorted slot
    sorted_rank = rank[perm]
    records = jnp.asarray(rng.normal(size=(n, 16)), jnp.float32)
    # same-sign cotangent: worst case for prefix-sum rounding
    g = jnp.asarray(np.abs(rng.normal(size=(mp, 16))), jnp.float32)
    g = g * jnp.asarray(perm < total, jnp.float32)[:, None]

    _, vjp = jax.vjp(
        lambda r: _gather_pairs(r, jnp.asarray(sorted_rank),
                                jnp.asarray(inv_perm), jnp.asarray(lo),
                                jnp.asarray(hi)), records)
    (got,) = vjp(g)

    g_em = np.asarray(g)[perm.argsort()][:total]
    want = np.zeros((n, 16), np.float64)
    np.add.at(want, rank[:total], g_em.astype(np.float64))
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=1e-3)


def test_pair_gradient_zero_rows_invariant():
    """The rasterizer backward must write EXACT zeros into the bbox, tile
    and constant-one record rows: ops/binning._gather_pairs_fm_bwd relies
    on it (it sorts/scans only binning._GRAD_ROWS -- the memory-lean path
    for dense pools). If a kernel change ever routes gradient into another
    row, this must fail loudly rather than silently dropping gradient."""
    from intro_to_gaussian_splatting_tpu.ops import projection as P
    from intro_to_gaussian_splatting_tpu.ops.binning import (
        _GRAD_ROWS, bin_gaussians, num_groups_for, tile_grid,
    )
    from intro_to_gaussian_splatting_tpu.ops.projection import (
        project_gaussians,
    )
    from intro_to_gaussian_splatting_tpu.ops.rasterize_pallas import (
        rasterize_pairs,
    )

    raw, cam, model = small_scene(n=80, width=48, height=48, seed=33,
                                  scale_hi=0.3, opacity_hi=4.0)
    cfg = CFG
    ntx, nty = tile_grid(cam.width, cam.height, cfg.tile_size)
    ng = num_groups_for(ntx * nty, cfg)
    proj = project_gaussians(model, cam, cfg)
    bins = bin_gaussians(proj, cam.width, cam.height, cfg)

    def loss(records):
        tiles = rasterize_pairs(records, bins.group_starts, ng, cfg, True)
        return jnp.sum(tiles[:, :4] ** 2)

    drec = np.asarray(jax.grad(loss)(bins.pair_records))   # (16, MP)
    zero_rows = sorted(set(range(P.NUM_REC_ROWS)) - set(_GRAD_ROWS))
    assert zero_rows == [P.REC_MIN_X, P.REC_MAX_X, P.REC_MIN_Y,
                         P.REC_MAX_Y, P.REC_TILE, P.REC_ONE]
    assert np.abs(drec[zero_rows]).max() == 0.0, \
        "gradient leaked into a row _gather_pairs_fm_bwd does not carry"
    assert np.abs(drec[list(_GRAD_ROWS)]).max() > 0.0, \
        "no gradient at all -- degenerate test scene"


def test_feature_major_gather_path_matches(monkeypatch):
    """The large-pool feature-major gather (slabbed forward + stable-sort
    backward, ops/binning._gather_pairs_fm) must be numerically identical
    to the default pair-major path: forced on by dropping the threshold,
    with a slab size smaller than the pool so the fori_loop really slabs."""
    from intro_to_gaussian_splatting_tpu.ops import binning as B

    raw, cam, model = small_scene(n=120, width=48, height=48, seed=19,
                                  scale_hi=0.35, opacity_hi=5.0)
    target = jnp.asarray(
        np.linspace(0, 1, 48 * 48 * 3, dtype=np.float32).reshape(48, 48, 3))

    def loss(params):
        img = render_tiled(model.replace(**params), cam, CFG, interpret=True)
        return jnp.mean(jnp.abs(img - target))

    l0, g0 = jax.value_and_grad(loss)(model.params())

    monkeypatch.setattr(B, "_FM_PAIR_THRESHOLD", 0)
    monkeypatch.setattr(B, "_FM_SLAB", 512)
    jax.clear_caches()   # recompile render_tiled against the patched path
    l1, g1 = jax.value_and_grad(loss)(model.params())
    jax.clear_caches()   # do not leak patched executables to other tests

    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for k in g0:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g0[k]),
                                   rtol=1e-5, atol=1e-7,
                                   err_msg=f"fm-path grad mismatch: {k}")


@pytest.mark.parametrize("gps", [1, 3, 4])
def test_groups_per_step_batching_is_exact(gps):
    """Batching several tile groups into one sequential grid step
    (config.groups_per_step, padding the group count) must not change the
    rendered image or the gradients at all -- including a gps that does
    NOT divide the natural group count."""
    import dataclasses

    raw, cam, model = small_scene(n=100, width=64, height=48, seed=23,
                                  scale_hi=0.3, opacity_hi=4.0)
    target = jnp.asarray(
        np.linspace(0, 1, 48 * 64 * 3, dtype=np.float32).reshape(48, 64, 3))

    def run(cfg):
        def loss(params):
            img = render_tiled(model.replace(**params), cam, cfg,
                               interpret=True)
            return jnp.mean(jnp.abs(img - target)), img
        (l, img), g = jax.value_and_grad(loss, has_aux=True)(model.params())
        return l, img, g

    base = dataclasses.replace(CFG, groups_per_step=1)
    l0, img0, g0 = run(base)
    l1, img1, g1 = run(dataclasses.replace(CFG, groups_per_step=gps))
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img0))
    np.testing.assert_allclose(float(l1), float(l0), rtol=0, atol=0)
    for k in g0:
        np.testing.assert_array_equal(np.asarray(g1[k]), np.asarray(g0[k]),
                                      err_msg=f"gps={gps} grad: {k}")
