"""Multi-chip rendering and training via shard_map.

Decomposition (SURVEY.md section 5 "long-context" row -- the splatting
analogue of sequence parallelism):

  * Gaussians are sharded over the "gauss" mesh axis. Each device projects
    its shard (EWA + SH, perfectly parallel) and packs records.
  * Image tile rows are sharded over ALL devices (axes ("gauss", "tiles")
    combined): every device rasterizes its own strip of tiles with the same
    Pallas kernel used on one chip.
  * Records reach the strip owners one of two ways:
      - ``ring=True`` (default): a ``ppermute`` RING over the gauss axis --
        the ring-attention-shaped pipeline SURVEY §5/§7 stage 5 prescribes.
        Each device holds one projected shard in flight (O(N/gauss) bytes),
        extracts the (tile, depth, record) pairs overlapping its own strip
        into a fixed local pair buffer, and passes the shard on; after
        gauss_axis steps every shard has visited every strip owner. ONE
        stable (tile, depth) sort then restores exact global compositing
        order -- emission order never matters, so the ring needs no global
        depth pre-sort at all. Reverse-mode AD transposes the ppermute ring
        into the reverse ring, carrying record cotangents back to shard
        owners.
      - ``ring=False``: ``all_gather`` the records along "gauss" (simpler,
        but replicates all N records on every device -- ~64 B/gaussian,
        192 MB/step at the 3M-gaussian BASELINE target, which defeats
        gaussian-shard memory scaling; kept as the small-scene fast path
        and as the oracle the ring is tested against).
  * The scalar loss is a masked psum over both axes; everything downstream
    (optimizer update on sharded params) stays element-wise sharded.

Caveats vs the single-chip path: SSIM windows do not cross strip
boundaries (strip-local SSIM; the per-strip losses are row-weighted, so
padded strips do not bias the mean); densification runs on
globally-sharded arrays under jit (XLA inserts gathers for the argsorts).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

from intro_to_gaussian_splatting_tpu.config import RasterizerConfig, TrainConfig
from intro_to_gaussian_splatting_tpu.models.camera import Camera
from intro_to_gaussian_splatting_tpu.models.gaussians import GaussianModel
from intro_to_gaussian_splatting_tpu.ops import projection as P
from intro_to_gaussian_splatting_tpu.ops.binning import bin_gaussians, tile_grid
from intro_to_gaussian_splatting_tpu.ops.projection import (
    pack_records,
    project_gaussians,
)
from intro_to_gaussian_splatting_tpu.ops.rasterize_pallas import (
    _interpret_default,
    rasterize_pairs,
    untile,
)
from intro_to_gaussian_splatting_tpu.parallel.mesh import GAUSS_AXIS, TILE_AXIS
from intro_to_gaussian_splatting_tpu.train.loss import ssim_chw

try:
    from jax import shard_map as _shard_map_mod  # jax >= 0.7 style
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def strip_layout(height: int, tile_size: int, n_strips: int) -> Tuple[int, int]:
    """Rows are padded so each device owns an equal strip of whole tiles.
    Returns (strip_rows, padded_height)."""
    nty = -(-height // tile_size)
    nty_pad = -(-nty // n_strips) * n_strips
    strip_rows = (nty_pad // n_strips) * tile_size
    return strip_rows, strip_rows * n_strips


def pad_rows(image, padded_height: int):
    return jnp.pad(image, ((0, padded_height - image.shape[0]),) +
                   ((0, 0),) * (image.ndim - 1))


def shard_model(model: GaussianModel, mesh: Mesh) -> GaussianModel:
    """Place gaussian arrays sharded over the gauss axis (capacity must be
    divisible by the axis size)."""
    g = mesh.shape[GAUSS_AXIS]
    assert model.capacity % g == 0, \
        f"capacity {model.capacity} not divisible by gauss axis {g}"
    sh = NamedSharding(mesh, PS(GAUSS_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sh), model)


def _strip_index():
    return (jax.lax.axis_index(GAUSS_AXIS) * jax.lax.axis_size(TILE_AXIS)
            + jax.lax.axis_index(TILE_AXIS))


def ring_max_pairs(capacity: int, n_strips: int,
                   rcfg: RasterizerConfig) -> int:
    """Default per-strip pair capacity for the ring path: the single-chip
    budget (pairs_per_gaussian * N) split across strips, with 2x slack for
    uneven tile occupancy, rounded to whole chunks."""
    from intro_to_gaussian_splatting_tpu.ops.binning import round_up
    per = 2 * rcfg.pairs_per_gaussian * capacity // max(n_strips, 1)
    return round_up(max(per, rcfg.chunk_size), rcfg.chunk_size)


def _ring_bin_strip(proj_local, width: int, strip_rows: int,
                    rcfg: RasterizerConfig, max_pairs_local: int):
    """Runs INSIDE shard_map: ppermute-ring the local projected shard around
    the gauss axis, collecting this device's strip pairs; returns
    (pair_records (16, MP), group_starts (NG+1,), overflowed ()).

    Replaces ``all_gather + bin_gaussians`` with O(N/gauss) in-flight record
    memory. Compositing order is exact: pairs are finally sorted by
    (tile, camera depth, emission index), so the arbitrary shard arrival
    order never reaches the rasterizer. Same span/clamp semantics as
    ops/binning.bin_gaussians (ref tile overlap: gaussian_scene.py:208-226);
    overflow drops whole gaussians within the arriving shard, far tail last.
    """
    ts = rcfg.tile_size
    ntx, nty_local = tile_grid(width, strip_rows, ts)
    num_tiles = ntx * nty_local
    gt = rcfg.group_tiles
    num_groups = -(-num_tiles // gt)
    sentinel = float(num_groups * gt)
    mp = max_pairs_local
    # +1 sentinel-keyed chunk: the rasterize_pairs contract (its last DMA
    # window may overhang the true pair range; see rasterize_pallas)
    mp_alloc = mp + rcfg.chunk_size
    g_size = jax.lax.axis_size(GAUSS_AXIS)
    row0 = (_strip_index() * strip_rows).astype(jnp.float32)
    ty_lo = (_strip_index() * nty_local).astype(jnp.int32)

    rec0 = pack_records(proj_local)                      # (16, Ns) global px
    valid0 = proj_local.valid
    ns = rec0.shape[1]
    perm = [(i, (i + 1) % g_size) for i in range(g_size)]

    buf_rec = jnp.zeros((mp_alloc, P.NUM_REC_ROWS), jnp.float32)
    buf_key = jnp.full((mp_alloc,), sentinel, jnp.float32)
    p_iota = jnp.arange(mp_alloc, dtype=jnp.int32)

    def step(carry, _):
        rec, valid, base, total, buf_rec, buf_key = carry
        bb = jax.lax.stop_gradient(rec)
        min_x, max_x = bb[P.REC_MIN_X], bb[P.REC_MAX_X]
        min_y, max_y = bb[P.REC_MIN_Y], bb[P.REC_MAX_Y]
        # identical tile-span rule to bin_gaussians (incl. the inclusive-
        # overlap compat shift); y intersected with this strip's tile rows
        if rcfg.compat.inclusive_tile_overlap:
            tx0 = jnp.ceil(min_x / ts).astype(jnp.int32) - 1
            ty0 = jnp.ceil(min_y / ts).astype(jnp.int32) - 1
        else:
            tx0 = jnp.floor(min_x / ts).astype(jnp.int32)
            ty0 = jnp.floor(min_y / ts).astype(jnp.int32)
        tx1 = jnp.floor(max_x / ts).astype(jnp.int32)
        ty1 = jnp.floor(max_y / ts).astype(jnp.int32)
        tx0 = jnp.maximum(tx0, 0)
        ty0 = jnp.maximum(ty0, ty_lo) - ty_lo            # strip-local rows
        tx1 = jnp.minimum(tx1, ntx - 1)
        ty1 = jnp.minimum(ty1, ty_lo + nty_local - 1) - ty_lo
        span_x = jnp.clip(tx1 - tx0 + 1, 0, rcfg.max_span)
        span_y = jnp.clip(ty1 - ty0 + 1, 0, rcfg.max_span)
        counts = jnp.where(valid, span_x * span_y, 0)
        offsets = jnp.concatenate(
            [jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)])
        step_total = offsets[-1]
        # whole-gaussian drop against the REMAINING buffer capacity
        rem = mp - base
        full = offsets[1:] <= rem
        emit_total = jnp.max(jnp.where(full, offsets[1:], 0))

        # ragged expand (same marks trick as bin_gaussians step 4)
        marks = jnp.zeros((mp_alloc,), jnp.int32).at[offsets[1:]].add(
            1, mode="drop")
        rank = jnp.clip(jnp.cumsum(marks), 0, ns - 1)
        geom = jnp.stack([offsets[:-1], span_x, tx0, ty0], axis=1)
        gp = jnp.take(geom, rank, axis=0)
        k = p_iota - gp[:, 0]
        dx = k % jnp.maximum(gp[:, 1], 1)
        dy = k // jnp.maximum(gp[:, 1], 1)
        tile_id = ((gp[:, 3] + dy) * ntx + (gp[:, 2] + dx)).astype(
            jnp.float32)
        emitted = p_iota < emit_total
        slot = jnp.where(emitted, base + p_iota, mp_alloc)   # OOB -> dropped
        pair_rows = jnp.take(rec.T, rank, axis=0)        # (MP, 16), diff'able
        buf_rec = buf_rec.at[slot].set(pair_rows, mode="drop")
        buf_key = buf_key.at[slot].set(tile_id, mode="drop")

        rec, valid = jax.lax.ppermute((rec, valid), GAUSS_AXIS, perm)
        return (rec, valid, base + emit_total, total + step_total,
                buf_rec, buf_key), None

    init = (rec0, valid0, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
            buf_rec, buf_key)
    (_, _, base, total, buf_rec, buf_key), _ = jax.lax.scan(
        step, init, None, length=g_size)

    # ONE stable sort restores exact global front-to-back order per tile
    depth_key = jax.lax.stop_gradient(buf_rec[:, P.REC_DEPTH])
    sorted_key, _, perm_idx = jax.lax.sort(
        (buf_key, depth_key, p_iota), dimension=0, is_stable=True,
        num_keys=2)
    pr = jnp.take(buf_rec, perm_idx, axis=0)             # (MP, 16)

    # localize means/bboxes to the owning tile's pixel frame (x: tile
    # column; y: global strip offset + tile row), as bin_gaussians step 7
    pair_valid = sorted_key < num_tiles
    sx = jnp.where(pair_valid, (sorted_key % ntx) * ts, 0.0)
    sy = jnp.where(pair_valid,
                   row0 + (sorted_key // ntx).astype(jnp.float32) * ts, 0.0)
    col = np.arange(P.NUM_REC_ROWS)
    is_x = jnp.asarray(np.isin(col, [P.REC_MEAN_X, P.REC_MIN_X, P.REC_MAX_X]),
                       jnp.float32)[None, :]
    is_y = jnp.asarray(np.isin(col, [P.REC_MEAN_Y, P.REC_MIN_Y, P.REC_MAX_Y]),
                       jnp.float32)[None, :]
    is_tile = jnp.asarray(col == P.REC_TILE, jnp.float32)[None, :]
    pr = (pr * (1.0 - is_tile) - sx[:, None] * is_x - sy[:, None] * is_y
          + sorted_key[:, None] * is_tile)

    boundaries = jnp.arange(num_groups + 1, dtype=jnp.int32) * gt
    group_starts = jnp.searchsorted(
        sorted_key, boundaries.astype(jnp.float32), side="left").astype(
        jnp.int32)
    return pr.T, group_starts, total > mp


def _render_strip(model_shard: GaussianModel, camera: Camera,
                  rcfg: RasterizerConfig, strip_rows: int,
                  active_sh_degree: Optional[int], interpret: bool,
                  ring: bool = True,
                  max_pairs_local: Optional[int] = None,
                  mean2d_offset: Optional[jax.Array] = None):
    """Runs INSIDE shard_map: project local shard, route records to strip
    owners (ppermute ring or all_gather), rasterize this device's tile
    strip. Returns ((strip_rows, W, 8) raw channels, overflowed)."""
    w = camera.width
    ts = rcfg.tile_size
    ntx, nty_local = tile_grid(w, strip_rows, ts)
    num_groups = -(-(ntx * nty_local) // rcfg.group_tiles)

    proj = project_gaussians(model_shard, camera, rcfg, active_sh_degree,
                             mean2d_offset)
    if ring:
        if max_pairs_local is None:
            n_strips = (jax.lax.axis_size(GAUSS_AXIS)
                        * jax.lax.axis_size(TILE_AXIS))
            max_pairs_local = ring_max_pairs(
                model_shard.capacity * jax.lax.axis_size(GAUSS_AXIS),
                n_strips, rcfg)
        records, group_starts, overflowed = _ring_bin_strip(
            proj, w, strip_rows, rcfg, max_pairs_local)
    else:
        proj_full = jax.tree.map(
            lambda x: jax.lax.all_gather(x, GAUSS_AXIS, axis=0, tiled=True),
            proj)
        # shift into this strip's pixel coordinates
        row0 = (_strip_index() * strip_rows).astype(jnp.float32)
        mean2d = proj_full.mean2d - jnp.stack(
            [jnp.zeros_like(row0), row0])[None, :]
        proj_strip = dataclasses.replace(proj_full, mean2d=mean2d)
        bins = bin_gaussians(proj_strip, w, strip_rows, rcfg)
        records, group_starts = bins.pair_records, bins.group_starts
        overflowed = bins.overflowed

    tile_out = rasterize_pairs(
        records, group_starts, num_groups, rcfg, interpret)
    strip = untile(tile_out, ntx, nty_local, ts, strip_rows, w)
    return strip, overflowed, jax.lax.stop_gradient(proj.valid)


@functools.partial(
    jax.jit,
    static_argnames=("rcfg", "active_sh_degree", "interpret", "mesh", "ring"))
def sharded_render(
    model: GaussianModel,
    camera: Camera,
    mesh: Mesh,
    rcfg: RasterizerConfig = RasterizerConfig(),
    active_sh_degree: Optional[int] = None,
    interpret: Optional[bool] = None,
    ring: bool = True,
) -> jax.Array:
    """Multi-device render -> (H, W, 3) on the host mesh."""
    if interpret is None:
        interpret = _interpret_default()
    n_strips = mesh.shape[GAUSS_AXIS] * mesh.shape[TILE_AXIS]
    strip_rows, padded_h = strip_layout(camera.height, rcfg.tile_size, n_strips)

    def f(model_shard, cam):
        strip, _, _ = _render_strip(model_shard, cam, rcfg, strip_rows,
                                    active_sh_degree, interpret, ring=ring)
        return strip

    out = shard_map(
        f, mesh=mesh,
        in_specs=(PS(GAUSS_AXIS), PS()),
        out_specs=PS((GAUSS_AXIS, TILE_AXIS)),
        check_vma=False,  # pallas_call does not declare varying-mesh axes
    )(model, camera)
    return out[:camera.height, :, :3]


def sharded_loss_fn(model_template: GaussianModel, camera: Camera, mesh: Mesh,
                    rcfg: RasterizerConfig, ssim_weight: float,
                    active_sh_degree: Optional[int], interpret: bool,
                    height: int, ring: bool = True):
    """Builds loss(params, probe, target_padded) ->
    (replicated scalar, aux dict).

    The probe is a zero-valued (capacity, 2) screen-space offset sharded
    over the gauss axis; its gradient is the 3DGS densification statistic
    (same mechanism as the single-chip train_step).

    Per-strip partial losses are combined as global (numerator, count)
    pairs, so padded strips and partial SSIM-window rows carry exactly
    their true weight (a plain mean over per-strip losses would give a
    mostly-padding strip the same vote as a full one).
    """
    n_strips = mesh.shape[GAUSS_AXIS] * mesh.shape[TILE_AXIS]
    strip_rows, padded_h = strip_layout(height, rcfg.tile_size, n_strips)
    win = 11  # SSIM window

    def inner(params_shard, active_shard, probe_shard, target_strip, cam):
        model_shard = model_template.replace(active=active_shard,
                                             **params_shard)
        strip, overflowed, visible = _render_strip(
            model_shard, cam, rcfg, strip_rows, active_sh_degree, interpret,
            ring=ring, mean2d_offset=probe_shard)
        strip = strip[..., :3]
        # mask rows beyond the true image height
        row0 = _strip_index() * strip_rows
        rows = jax.lax.broadcasted_iota(jnp.int32, (strip_rows, 1, 1), 0) + row0
        mask = (rows < height).astype(strip.dtype)
        strip = strip * mask
        target_strip = target_strip * mask

        def allsum(x):
            return jax.lax.psum(jax.lax.psum(x, GAUSS_AXIS), TILE_AXIS)

        l1_num = jnp.sum(jnp.abs(strip - target_strip))
        l1_den = jnp.sum(mask) * strip.shape[1] * 3.0
        sq_num = jnp.sum((strip - target_strip) ** 2)
        loss = allsum(l1_num) / allsum(l1_den)
        mse = allsum(sq_num) / allsum(l1_den)
        if ssim_weight > 0.0:
            smap = ssim_chw(strip.transpose(2, 0, 1),
                            target_strip.transpose(2, 0, 1), window=win,
                            reduce=False)          # (3, SR-10, W-10)
            # windows whose rows extend past the true image are invalid
            wrow = (jax.lax.broadcasted_iota(
                jnp.int32, (1, strip_rows - win + 1, 1), 1) + row0
                < height - win + 1).astype(strip.dtype)
            s_num = jnp.sum(smap * wrow)
            s_den = jnp.sum(wrow) * smap.shape[0] * smap.shape[2]
            ssim_mean = allsum(s_num) / allsum(s_den)
            loss = ((1.0 - ssim_weight) * loss
                    + ssim_weight * (1.0 - ssim_mean))
        aux = dict(
            overflowed=allsum(overflowed.astype(jnp.float32)) > 0.0,
            visible=visible,
            psnr=-10.0 * jnp.log10(jnp.maximum(mse, 1e-12)),
        )
        return loss, aux

    f = shard_map(
        inner, mesh=mesh,
        in_specs=(PS(GAUSS_AXIS), PS(GAUSS_AXIS), PS(GAUSS_AXIS),
                  PS((GAUSS_AXIS, TILE_AXIS)), PS()),
        out_specs=(PS(), dict(overflowed=PS(), visible=PS(GAUSS_AXIS),
                              psnr=PS())),
        check_vma=False,  # pallas_call does not declare varying-mesh axes
    )

    def loss(params, probe, target_padded):
        return f(params, model_template.active, probe, target_padded, camera)

    return loss, padded_h


@functools.partial(
    jax.jit,
    static_argnames=("rcfg", "tcfg", "tx", "mesh", "active_sh_degree",
                     "interpret", "ring"))
def sharded_train_step(
    model: GaussianModel,
    opt_state,
    dstate,
    camera: Camera,
    target_padded: jax.Array,
    mesh: Mesh,
    rcfg: RasterizerConfig,
    tcfg: TrainConfig,
    tx,
    active_sh_degree: int = 0,
    interpret: Optional[bool] = None,
    ring: bool = True,
):
    """One sharded optimization step -- the FULL 3DGS recipe (probe
    gradients feed `dstate` for densify/prune, exactly as the single-chip
    train_step). target_padded: (padded_H, W, 3) laid out with
    PS((gauss, tiles)) row sharding. Returns
    (model, opt_state, dstate, metrics)."""
    from intro_to_gaussian_splatting_tpu.train import densify as D

    if interpret is None:
        interpret = _interpret_default()
    loss_fn, _ = sharded_loss_fn(
        model, camera, mesh, rcfg, tcfg.ssim_weight, active_sh_degree,
        interpret, camera.height, ring=ring)
    params = model.params()
    probe = jnp.zeros((model.capacity, 2), jnp.float32)
    (loss, aux), grads = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(params, probe, target_padded)
    param_grads, screen_grads = grads
    updates, opt_state = tx.update(param_grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    new_model = model.replace(**jax.tree.map(
        lambda new, old: jnp.where(
            model.active.reshape((-1,) + (1,) * (new.ndim - 1)), new, old),
        params, model.params()))
    dstate = D.accumulate(dstate, screen_grads, aux["visible"])
    metrics = dict(loss=loss, psnr=aux["psnr"],
                   num_active=model.num_active,
                   overflowed=aux["overflowed"])
    return new_model, opt_state, dstate, metrics
