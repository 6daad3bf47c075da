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

SSIM windows cross strip boundaries exactly: each strip ppermutes a
(win-1)-row halo from its successor (_next_strip_halo) and owns precisely
the windows STARTING in its rows, so the sharded objective equals the
single-chip one (grad parity tested with ssim on). Per-strip losses are
combined as global (numerator, count) pairs, so padded strips carry their
true weight. Densification runs on globally-sharded arrays under jit
(XLA inserts gathers for the argsorts).
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
from intro_to_gaussian_splatting_tpu.ops.binning import (
    bin_gaussians, num_groups_for, tile_grid,
)
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


_RING_DEPTH_BUCKETS = 1024


def ring_hop_pairs(max_pairs_local: int, g_size: int,
                   rcfg: RasterizerConfig) -> int:
    """Default per-hop emission slab for the ring: ~4x the balanced share
    of the strip's pair budget, so each hop's buffer write is O(slab)
    instead of O(max_pairs) -- total ring write traffic O(4*MP) rather
    than O(gauss_axis * MP). Small gauss axes degrade to the full budget
    (exactness preserved).

    CAVEAT (skew): the slab caps what ONE shard may contribute to a strip
    in ONE hop. A shard->strip distribution skewed beyond 4x the balanced
    share drops that hop's overflow in ARRIVAL order (not the global
    far-to-near policy) and raises ``overflowed`` even when the strip's
    total demand fits ``max_pairs_local`` -- the slab size is a static
    buffer shape, so it cannot adapt to the pass-1 histogram at runtime.
    Recovery is the same as every other overflow: the Trainer observes the
    flag and doubles the pool (which scales the slab with it), or callers
    pass an explicit ``hop_pairs`` >= the known worst per-shard demand."""
    from intro_to_gaussian_splatting_tpu.ops.binning import round_up
    h = min(max_pairs_local,
            max(4 * max_pairs_local // max(g_size, 1), 2 * rcfg.chunk_size))
    return round_up(h, rcfg.chunk_size)


def _tile_spans(bb, ts, inclusive):
    """Tile-index bounds from bbox record rows, same rule as bin_gaussians
    step 2 (ref tile overlap: gaussian_scene.py:208-226). Returns
    un-clamped (tx0, tx1, ty0, ty1) in GLOBAL tile coordinates."""
    min_x, max_x = bb[P.REC_MIN_X], bb[P.REC_MAX_X]
    min_y, max_y = bb[P.REC_MIN_Y], bb[P.REC_MAX_Y]
    if inclusive:
        tx0 = jnp.ceil(min_x / ts).astype(jnp.int32) - 1
        ty0 = jnp.ceil(min_y / ts).astype(jnp.int32) - 1
    else:
        tx0 = jnp.floor(min_x / ts).astype(jnp.int32)
        ty0 = jnp.floor(min_y / ts).astype(jnp.int32)
    tx1 = jnp.floor(max_x / ts).astype(jnp.int32)
    ty1 = jnp.floor(max_y / ts).astype(jnp.int32)
    return tx0, tx1, ty0, ty1


def _ring_bin_strip(proj_local, width: int, strip_rows: int,
                    rcfg: RasterizerConfig, max_pairs_local: int,
                    hop_pairs: Optional[int] = None):
    """Runs INSIDE shard_map: ppermute-ring the local projected shard around
    the gauss axis, collecting this device's strip pairs; returns
    (pair_records (16, MP), group_starts (NG+1,), overflowed ()).

    Replaces ``all_gather + bin_gaussians`` with O(N/gauss) in-flight record
    memory. Compositing order is exact: pairs are finally sorted by
    (tile, camera depth, emission index), so the arbitrary shard arrival
    order never reaches the rasterizer. Same span/clamp semantics as
    ops/binning.bin_gaussians (ref tile overlap: gaussian_scene.py:208-226).

    Overflow policy matches single-chip ``bin_gaussians`` (global
    far-to-near whole-gaussian drop, ops/binning.py step 3) up to one
    depth-bucket of quantization: a collective-summed per-depth-bucket
    demand histogram (pass 1, no extra ring -- each device histograms its
    OWN shard for every strip and one psum over the gauss axis totals
    them) yields the deepest admitted depth whose cumulative demand fits
    this strip's budget; the ring pass then admits exactly the gaussians
    nearer than that threshold, independent of shard arrival order.

    Buffer writes are per-hop SLABS of ``hop_pairs`` rows placed
    contiguously with dynamic_update_slice into a feature-major
    (16, MP + hop) buffer -- O(emitted) traffic per hop and no pair-major
    (MP, 16) intermediate (whose 128-lane padding costs 8x memory).
    """
    ts = rcfg.tile_size
    ntx, nty_local = tile_grid(width, strip_rows, ts)
    num_tiles = ntx * nty_local
    gt = rcfg.group_tiles
    num_groups = num_groups_for(num_tiles, rcfg)
    sentinel = float(num_groups * gt)
    mp = max_pairs_local
    g_size = jax.lax.axis_size(GAUSS_AXIS)
    t_size = jax.lax.axis_size(TILE_AXIS)
    n_strips = g_size * t_size
    hop = hop_pairs or ring_hop_pairs(mp, g_size, rcfg)
    # slab overhang doubles as the rasterize_pairs sentinel-chunk contract
    # (its last DMA window may overhang the true pair range); the kernel
    # additionally requires a whole number of chunks
    from intro_to_gaussian_splatting_tpu.ops.binning import round_up
    mp_alloc = round_up(mp + hop, rcfg.chunk_size)
    row0 = (_strip_index() * strip_rows).astype(jnp.float32)
    ty_lo = (_strip_index() * nty_local).astype(jnp.int32)

    rec0 = pack_records(proj_local)                      # (16, Ns) global px
    valid0 = proj_local.valid
    ns = rec0.shape[1]
    perm = [(i, (i + 1) % g_size) for i in range(g_size)]
    inclusive = rcfg.compat.inclusive_tile_overlap

    # ---- pass 1 (collective, no ring): global far-tail admission -------
    nb = _RING_DEPTH_BUCKETS
    depth0 = jax.lax.stop_gradient(rec0[P.REC_DEPTH])
    dmin = jax.lax.pmin(
        jnp.min(jnp.where(valid0, depth0, jnp.inf)), GAUSS_AXIS)
    dmax = jax.lax.pmax(
        jnp.max(jnp.where(valid0, depth0, -jnp.inf)), GAUSS_AXIS)
    dscale = nb / jnp.maximum(dmax - dmin, 1e-12)

    def bucket_of(d):
        return jnp.clip(((d - dmin) * dscale).astype(jnp.int32), 0, nb - 1)

    tx0_0, tx1_0, ty0_0, ty1_0 = _tile_spans(
        jax.lax.stop_gradient(rec0), ts, inclusive)
    tx0_0 = jnp.maximum(tx0_0, 0)
    tx1_0 = jnp.minimum(tx1_0, ntx - 1)
    span_x0 = jnp.clip(tx1_0 - tx0_0 + 1, 0, rcfg.max_span)
    b0 = bucket_of(depth0)
    hist_rows = []
    for s in range(n_strips):
        lo, hi = s * nty_local, (s + 1) * nty_local - 1
        rows = jnp.clip(
            jnp.minimum(ty1_0, hi) - jnp.maximum(ty0_0, lo) + 1,
            0, rcfg.max_span)
        c = jnp.where(valid0, span_x0 * rows, 0)
        hist_rows.append(
            jnp.zeros((nb,), jnp.int32).at[b0].add(c, mode="drop"))
    hist = jax.lax.psum(jnp.stack(hist_rows), GAUSS_AXIS)  # (n_strips, NB)
    my_cum = jnp.cumsum(jnp.take(hist, _strip_index(), axis=0))
    # deepest admitted bucket prefix that fits the budget; kept >= 1 so a
    # single overfull bucket degrades to arrival-order capping (the cap
    # below) instead of dropping everything
    bstar = jnp.maximum(jnp.sum((my_cum <= mp).astype(jnp.int32)), 1)

    # ---- pass 2: the ring ---------------------------------------------
    buf_rec = jnp.zeros((P.NUM_REC_ROWS, mp_alloc), jnp.float32)
    buf_key = jnp.full((mp_alloc,), sentinel, jnp.float32)
    p_iota = jnp.arange(hop, dtype=jnp.int32)

    def step(carry, _):
        rec, valid, base, total, hop_ovf, buf_rec, buf_key = carry
        bb = jax.lax.stop_gradient(rec)
        tx0, tx1, ty0, ty1 = _tile_spans(bb, ts, inclusive)
        tx0 = jnp.maximum(tx0, 0)
        ty0 = jnp.maximum(ty0, ty_lo) - ty_lo            # strip-local rows
        tx1 = jnp.minimum(tx1, ntx - 1)
        ty1 = jnp.minimum(ty1, ty_lo + nty_local - 1) - ty_lo
        span_x = jnp.clip(tx1 - tx0 + 1, 0, rcfg.max_span)
        span_y = jnp.clip(ty1 - ty0 + 1, 0, rcfg.max_span)
        demand = jnp.where(valid, span_x * span_y, 0)
        admit = bucket_of(bb[P.REC_DEPTH]) < bstar
        counts = jnp.where(admit, demand, 0)
        offsets = jnp.concatenate(
            [jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)])
        # whole-gaussian cap against slab size and (fallback-case only)
        # remaining capacity; under the bstar threshold the global
        # admitted total never exceeds mp, so base + emit <= mp always
        cap = jnp.minimum(hop, mp - base)
        full = offsets[1:] <= cap
        emit_total = jnp.max(jnp.where(full, offsets[1:], 0))
        hop_ovf = hop_ovf | (emit_total < offsets[-1])

        # ragged expand over the hop slab (marks trick, binning step 4)
        marks = jnp.zeros((hop,), jnp.int32).at[offsets[1:]].add(
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
        # zero masked lanes so any junk cotangent on an overwritten or
        # sentinel lane cannot scatter back into real record gradients
        slab_rec = jnp.take(rec, rank, axis=1) * \
            emitted.astype(jnp.float32)[None, :]          # (16, hop)
        slab_key = jnp.where(emitted, tile_id, sentinel)
        buf_rec = jax.lax.dynamic_update_slice(buf_rec, slab_rec, (0, base))
        buf_key = jax.lax.dynamic_update_slice(buf_key, slab_key, (base,))

        rec, valid = jax.lax.ppermute((rec, valid), GAUSS_AXIS, perm)
        return (rec, valid, base + emit_total, total + jnp.sum(demand),
                hop_ovf, buf_rec, buf_key), None

    init = (rec0, valid0, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
            jnp.zeros((), bool), buf_rec, buf_key)
    (_, _, base, total, hop_ovf, buf_rec, buf_key), _ = jax.lax.scan(
        step, init, None, length=g_size)

    # ONE stable sort restores exact global front-to-back order per tile
    depth_key = jax.lax.stop_gradient(buf_rec[P.REC_DEPTH])
    sorted_key, _, perm_idx = jax.lax.sort(
        (buf_key, depth_key, jnp.arange(mp_alloc, dtype=jnp.int32)),
        dimension=0, is_stable=True, num_keys=2)
    pr = jnp.take(buf_rec, perm_idx, axis=1)             # (16, MP_alloc)

    # localize means/bboxes to the owning tile's pixel frame (x: tile
    # column; y: global strip offset + tile row), as bin_gaussians step 7
    pair_valid = sorted_key < num_tiles
    sx = jnp.where(pair_valid, (sorted_key % ntx) * ts, 0.0)
    sy = jnp.where(pair_valid,
                   row0 + (sorted_key // ntx).astype(jnp.float32) * ts, 0.0)
    col = np.arange(P.NUM_REC_ROWS)
    is_x = jnp.asarray(np.isin(col, [P.REC_MEAN_X, P.REC_MIN_X, P.REC_MAX_X]),
                       jnp.float32)[:, None]
    is_y = jnp.asarray(np.isin(col, [P.REC_MEAN_Y, P.REC_MIN_Y, P.REC_MAX_Y]),
                       jnp.float32)[:, None]
    is_tile = jnp.asarray(col == P.REC_TILE, jnp.float32)[:, None]
    pr = (pr * (1.0 - is_tile) - sx[None, :] * is_x - sy[None, :] * is_y
          + sorted_key[None, :] * is_tile)

    boundaries = jnp.arange(num_groups + 1, dtype=jnp.int32) * gt
    group_starts = jnp.searchsorted(
        sorted_key, boundaries.astype(jnp.float32), side="left").astype(
        jnp.int32)
    # per-strip communication/occupancy accounting (weak-scaling evidence:
    # VERDICT r4 item 5). bytes_ppermuted counts this device's ring traffic
    # for the forward pass: (16 f32 record rows + valid byte) per shard
    # slot, g_size hops (the AD transpose rings the cotangents back, so a
    # train step moves ~2x this).
    stats = dict(
        demand=total,                          # pairs this strip wanted
        emitted=base,                          # pairs actually admitted
        slab_slots=jnp.asarray(hop * g_size, jnp.int32),
        bytes_ppermuted=jnp.asarray(
            float(P.NUM_REC_ROWS * 4 + 1) * g_size * ns, jnp.float32),
    )
    return pr, group_starts, (total > mp) | hop_ovf, stats


def _render_strip(model_shard: GaussianModel, camera: Camera,
                  rcfg: RasterizerConfig, strip_rows: int,
                  active_sh_degree: Optional[int], interpret: bool,
                  ring: bool = True,
                  max_pairs_local: Optional[int] = None,
                  mean2d_offset: Optional[jax.Array] = None,
                  hop_pairs: Optional[int] = None):
    """Runs INSIDE shard_map: project local shard, route records to strip
    owners (ppermute ring or all_gather), rasterize this device's tile
    strip. Returns ((strip_rows, W, 8) raw channels, overflowed)."""
    w = camera.width
    ts = rcfg.tile_size
    ntx, nty_local = tile_grid(w, strip_rows, ts)
    num_groups = num_groups_for(ntx * nty_local, rcfg)

    proj = project_gaussians(model_shard, camera, rcfg, active_sh_degree,
                             mean2d_offset)
    if ring:
        if max_pairs_local is None:
            n_strips = (jax.lax.axis_size(GAUSS_AXIS)
                        * jax.lax.axis_size(TILE_AXIS))
            max_pairs_local = ring_max_pairs(
                model_shard.capacity * jax.lax.axis_size(GAUSS_AXIS),
                n_strips, rcfg)
        records, group_starts, overflowed, stats = _ring_bin_strip(
            proj, w, strip_rows, rcfg, max_pairs_local, hop_pairs)
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
        # all_gather replicates every record on every strip owner
        g_size = jax.lax.axis_size(GAUSS_AXIS)
        stats = dict(
            demand=bins.num_pairs,
            emitted=jnp.minimum(
                bins.num_pairs,
                jnp.asarray(records.shape[1], jnp.int32)),
            slab_slots=jnp.asarray(records.shape[1], jnp.int32),
            bytes_ppermuted=jnp.asarray(
                float(P.NUM_REC_ROWS * 4 + 1) * (g_size - 1)
                * proj.depth.shape[0], jnp.float32),
        )

    tile_out = rasterize_pairs(
        records, group_starts, num_groups, rcfg, interpret)
    strip = untile(tile_out, ntx, nty_local, ts, strip_rows, w)
    return strip, overflowed, jax.lax.stop_gradient(proj.valid), stats


@functools.partial(
    jax.jit,
    static_argnames=("rcfg", "active_sh_degree", "interpret", "mesh", "ring",
                     "max_pairs_local", "hop_pairs"))
def sharded_render(
    model: GaussianModel,
    camera: Camera,
    mesh: Mesh,
    rcfg: RasterizerConfig = RasterizerConfig(),
    active_sh_degree: Optional[int] = None,
    interpret: Optional[bool] = None,
    ring: bool = True,
    max_pairs_local: Optional[int] = None,
    hop_pairs: Optional[int] = None,
) -> jax.Array:
    """Multi-device render -> (H, W, 3) on the host mesh.

    ``max_pairs_local`` / ``hop_pairs`` override the ring's per-strip pair
    budget and per-hop slab (defaults: ring_max_pairs / ring_hop_pairs);
    exceeding the budget drops whole gaussians far-to-near globally, like
    the single-chip pool (see _ring_bin_strip)."""
    if interpret is None:
        interpret = _interpret_default()
    n_strips = mesh.shape[GAUSS_AXIS] * mesh.shape[TILE_AXIS]
    strip_rows, padded_h = strip_layout(camera.height, rcfg.tile_size, n_strips)

    def f(model_shard, cam):
        strip, _, _, _ = _render_strip(model_shard, cam, rcfg, strip_rows,
                                       active_sh_degree, interpret,
                                       ring=ring,
                                       max_pairs_local=max_pairs_local,
                                       hop_pairs=hop_pairs)
        return strip

    out = shard_map(
        f, mesh=mesh,
        in_specs=(PS(GAUSS_AXIS), PS()),
        out_specs=PS((GAUSS_AXIS, TILE_AXIS)),
        check_vma=False,  # pallas_call does not declare varying-mesh axes
    )(model, camera)
    return out[:camera.height, :, :3]


def _next_strip_halo(x: jax.Array, rows: int) -> jax.Array:
    """First ``rows`` rows of the NEXT strip (index s+1 in the combined
    (gauss, tiles) strip order), delivered to strip s: a ppermute shift
    along the tile axis, plus a gauss-axis shift for the column that
    wrapped (strip (g, T-1) needs rows from (g+1, 0)). The final strip
    receives wrapped garbage; callers must mask it (its windows lie past
    the true image height, so the row mask already does)."""
    t_size = jax.lax.axis_size(TILE_AXIS)
    g_size = jax.lax.axis_size(GAUSS_AXIS)
    head = x[:rows]
    a = jax.lax.ppermute(head, TILE_AXIS,
                         [((t + 1) % t_size, t) for t in range(t_size)])
    b = jax.lax.ppermute(a, GAUSS_AXIS,
                         [((g + 1) % g_size, g) for g in range(g_size)])
    is_last_col = jax.lax.axis_index(TILE_AXIS) == t_size - 1
    return jnp.where(is_last_col, b, a)


def sharded_loss_fn(model_template: GaussianModel, camera: Camera, mesh: Mesh,
                    rcfg: RasterizerConfig, ssim_weight: float,
                    active_sh_degree: Optional[int], interpret: bool,
                    height: int, ring: bool = True,
                    max_pairs_local: Optional[int] = None,
                    hop_pairs: Optional[int] = None):
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
    assert strip_rows >= win - 1, \
        f"strips of {strip_rows} rows are thinner than the SSIM halo"

    def inner(params_shard, active_shard, probe_shard, target_strip, cam):
        model_shard = model_template.replace(active=active_shard,
                                             **params_shard)
        strip, overflowed, visible, rstats = _render_strip(
            model_shard, cam, rcfg, strip_rows, active_sh_degree, interpret,
            ring=ring, mean2d_offset=probe_shard,
            max_pairs_local=max_pairs_local, hop_pairs=hop_pairs)
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
            # cross-strip halo: windows starting in this strip may read up
            # to win-1 rows of the NEXT strip; ppermute them in so the
            # sharded objective equals the single-chip one at strip
            # boundaries (without this, boundary windows were silently
            # dropped and multi-chip SSIM diverged from single-chip)
            ext_p = jnp.concatenate(
                [strip, _next_strip_halo(strip, win - 1)], axis=0)
            ext_t = jnp.concatenate(
                [target_strip, _next_strip_halo(target_strip, win - 1)],
                axis=0)
            smap = ssim_chw(ext_p.transpose(2, 0, 1),
                            ext_t.transpose(2, 0, 1), window=win,
                            reduce=False)          # (3, SR, W-10)
            # exactly the windows STARTING in this strip count (global
            # coverage: each of the image's height-win+1 window rows is
            # owned by one strip); rows past the true image are invalid
            wrow = (jax.lax.broadcasted_iota(
                jnp.int32, (1, strip_rows, 1), 1) + row0
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
            # global ring accounting (weak-scaling evidence): total pair
            # demand/admission across strips, and the per-device ring
            # traffic (max over devices -- they are symmetric by design)
            ring_demand=allsum(rstats["demand"].astype(jnp.float32)),
            ring_emitted=allsum(rstats["emitted"].astype(jnp.float32)),
            ring_bytes_per_device=jax.lax.pmax(jax.lax.pmax(
                rstats["bytes_ppermuted"], GAUSS_AXIS), TILE_AXIS),
        )
        return loss, aux

    f = shard_map(
        inner, mesh=mesh,
        in_specs=(PS(GAUSS_AXIS), PS(GAUSS_AXIS), PS(GAUSS_AXIS),
                  PS((GAUSS_AXIS, TILE_AXIS)), PS()),
        out_specs=(PS(), dict(overflowed=PS(), visible=PS(GAUSS_AXIS),
                              psnr=PS(), ring_demand=PS(),
                              ring_emitted=PS(),
                              ring_bytes_per_device=PS())),
        check_vma=False,  # pallas_call does not declare varying-mesh axes
    )

    def loss(params, probe, target_padded):
        return f(params, model_template.active, probe, target_padded, camera)

    return loss, padded_h


@functools.partial(
    jax.jit,
    static_argnames=("rcfg", "tcfg", "tx", "mesh", "active_sh_degree",
                     "interpret", "ring", "max_pairs_local", "hop_pairs"))
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
    max_pairs_local: Optional[int] = None,
    hop_pairs: Optional[int] = None,
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
        interpret, camera.height, ring=ring,
        max_pairs_local=max_pairs_local, hop_pairs=hop_pairs)
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
                   overflowed=aux["overflowed"],
                   ring_demand=aux["ring_demand"],
                   ring_emitted=aux["ring_emitted"],
                   ring_bytes_per_device=aux["ring_bytes_per_device"])
    return new_model, opt_state, dstate, metrics
