"""Tile binning: gaussians -> per-tile contiguous, depth-ordered pair ranges.

The reference bins on the CPU path with per-tile boolean masks re-evaluated
for every tile (splat/gaussian_scene.py:208-226, O(tiles*N) host work) and
does not bin at all on the CUDA path (every thread scans all N gaussians,
render.cu:49-60). Neither works on TPU: XLA needs static shapes and the
rasterizer kernel needs contiguous DMA-able per-tile ranges.

TPU-native design (all static shapes, no scatters):
  1. depth-argsort the gaussians (front to back), ref gaussian_scene.py:117.
  2. per gaussian: clamped tile-span [tx0,tx1]x[ty0,ty1] from its bbox;
     pair_count = span_x * span_y (0 for culled gaussians).
  3. exclusive-prefix-sum pair counts -> each gaussian's slot offset.
  4. every pair slot p finds its gaussian by binary search over the offsets
     (``searchsorted``) -- a gather-only "ragged expand" with no scatter --
     and decodes its tile id from p - offset.
  5. one stable sort by tile id groups pairs per tile; stability preserves
     depth order within each tile (emission order is depth-rank order).
  6. per-tile [start, count) ranges by binary search of tile boundaries.
  7. gather the packed records into pair order: (NUM_REC_ROWS, MAX_PAIRS)
     feature-major, the layout the Pallas kernel streams chunk by chunk.

Differentiability: the index computation is integer/stop-gradient, but the
final records gather is a ``jnp.take``, so reverse-mode AD automatically
scatter-adds pair gradients back to gaussian slots (deterministically).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from intro_to_gaussian_splatting_tpu.config import RasterizerConfig
from intro_to_gaussian_splatting_tpu.ops import projection as P
from intro_to_gaussian_splatting_tpu.ops.projection import (
    ProjectedGaussians,
    pack_records,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TileBins:
    pair_records: jax.Array  # (NUM_REC_ROWS, MAX_PAIRS) f32, feature-major,
    #                          tile-grouped, means/bboxes TILE-LOCAL,
    #                          REC_TILE row = owning tile id
    pair_rank: jax.Array     # (MAX_PAIRS,) int32 depth rank per pair
    pair_valid: jax.Array    # (MAX_PAIRS,) bool
    tile_starts: jax.Array   # (NT,) int32 first pair of each tile
    tile_counts: jax.Array   # (NT,) int32
    group_starts: jax.Array  # (NG + 1,) int32 first pair of each tile group
    num_pairs: jax.Array     # () int32 total emitted pairs (pre-drop)
    overflowed: jax.Array    # () bool: num_pairs > MAX_PAIRS (tail dropped)


def tile_grid(width: int, height: int, tile_size: int) -> Tuple[int, int]:
    return (-(-width // tile_size), -(-height // tile_size))


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def num_groups_for(num_tiles: int, config: RasterizerConfig) -> int:
    """Tile-group count, PADDED to a whole number of rasterizer grid steps
    (config.groups_per_step groups run per sequential Mosaic grid step to
    amortize per-step dispatch overhead). Padded groups are empty -- their
    pair range is [end, end) and their output block is zeros. Every
    group-count in the pipeline (binning sentinel/boundaries, kernel grid,
    tiled-target layouts) must use THIS count so shapes line up."""
    ng = -(-num_tiles // config.group_tiles)
    gps = config.groups_per_step
    return -(-ng // gps) * gps


@jax.custom_vjp
def _gather_pairs(records_rank, sorted_rank, inv_perm, lo, hi):
    """Row-gather records into sorted pair order, with a gather-only VJP.

    The autodiff transpose of this take is a scatter-add with duplicate
    indices, which XLA lowers through an extra full sort (~6 ms at treehill
    scale). But each gaussian's pairs are CONTIGUOUS in emission order
    [offsets[i], offsets[i+1]), so the backward is instead: permute pair
    gradients back to emission order (row gather by the sort's inverse
    permutation), then reduce each contiguous block as a difference of an
    exclusive running sum -- gathers and scans only, no sorted scatter.
    """
    del inv_perm, lo, hi
    return jnp.take(records_rank, sorted_rank, axis=0)


def _gather_pairs_fwd(records_rank, sorted_rank, inv_perm, lo, hi):
    return _gather_pairs(records_rank, sorted_rank, inv_perm, lo, hi), \
        (sorted_rank, inv_perm, lo, hi)


_CUM_BLOCK = 512


def _gather_pairs_bwd(res, g):
    _, inv_perm, lo, hi = res
    g_em = jnp.take(g, inv_perm, axis=0)                    # emission order
    # Two-level exclusive running sum. A flat fp32 cumsum would put
    # ~eps * (global gradient mass) of rounding error into EVERY per-block
    # difference; with intra-block prefixes + a coarse prefix of block
    # totals, a segment inside one block sees only block-local rounding
    # (the coarse terms cancel exactly) and a spanning segment sees one
    # coarse rounding instead of `len` of them.
    mp, c = g_em.shape
    b = _CUM_BLOCK
    nb = -(-mp // b)
    gp = jnp.pad(g_em, ((0, (nb + 1) * b - mp), (0, 0)))
    fine = jnp.cumsum(gp.reshape(nb + 1, b, c), axis=1)
    totals = fine[:, -1]                                     # (NB+1, C)
    coarse = jnp.cumsum(totals, axis=0) - totals             # exclusive
    fine_ex = jnp.concatenate(
        [jnp.zeros((nb + 1, 1, c), g.dtype), fine[:, :-1]], axis=1)
    fine_flat = fine_ex.reshape((nb + 1) * b, c)

    chi, clo = jnp.take(coarse, hi // b, axis=0), jnp.take(coarse, lo // b,
                                                           axis=0)
    fhi, flo = jnp.take(fine_flat, hi, axis=0), jnp.take(fine_flat, lo,
                                                         axis=0)
    d_records = (chi - clo) + (fhi - flo)
    return d_records, None, None, None, None


_gather_pairs.defvjp(_gather_pairs_fwd, _gather_pairs_bwd)


# ---------------------------------------------------------------------------
# Large-pool gather: feature-major end to end.
#
# A pair-major (MP, 16) f32 array tiles as T(8, 128) on TPU: the 16-wide
# minor dim pads to 128 lanes, an 8x memory expansion that OOMs the chip at
# honest dense pair counts (observed: 30.6M pairs -> 14.6 GB padded temp on
# a 16 GB v5e). Above _FM_PAIR_THRESHOLD the pipeline therefore never
# materializes a pair-major intermediate:
#   * forward: the row gather runs in fixed-size slabs inside a fori_loop,
#     transposing each (SLAB, 16) slab into a dense (16, MP) output in
#     place -- peak extra memory is one ~1 GB padded slab;
#   * backward: the emission-order permutation of the cotangent is ONE
#     stable 17-operand sort keyed by the pair's depth rank. Within a
#     gaussian, emission order (k = dy*span_x + dx ascending) is exactly
#     tile-id ascending, which is the order the tile sort left its pairs
#     in -- so a stable sort by rank reproduces emission order exactly,
#     operating on dense 1-D operands only. The two-level cumsum-difference
#     reduction then runs feature-major.
# ---------------------------------------------------------------------------

_FM_PAIR_THRESHOLD = 1 << 22     # pairs; above this the padded temp > 2 GB
_FM_SLAB = 1 << 21               # pairs per forward gather slab (~1 GB padded)


def _loc_masks(dtype=np.float32):
    """Static per-feature-row localization selectors (which rows shift by
    the tile origin / take the tile id)."""
    col = np.arange(P.NUM_REC_ROWS)
    is_x = np.isin(col, [P.REC_MEAN_X, P.REC_MIN_X, P.REC_MAX_X]).astype(dtype)
    is_y = np.isin(col, [P.REC_MEAN_Y, P.REC_MIN_Y, P.REC_MAX_Y]).astype(dtype)
    is_tile = (col == P.REC_TILE).astype(dtype)
    return is_x, is_y, is_tile


@jax.custom_vjp
def _gather_pairs_fm(records_rank, sorted_rank, sx, sy, tile_f, lo, hi):
    """records_rank (N, F) -> LOCALIZED (F, MP) in sorted pair order.

    Gather and tile-frame localization fused in one slab pass, so exactly
    one (F, MP) buffer is ever written (a second full-stream
    materialization costs ~2 GB at dense pair counts)."""
    del lo, hi
    return _take_localize_feature_major(records_rank, sorted_rank, sx, sy,
                                        tile_f)


def _take_localize_feature_major(src, idx, sx, sy, tile_f):
    mp = idx.shape[0]
    f = src.shape[1]
    slabs = -(-mp // _FM_SLAB)
    mp_pad = slabs * _FM_SLAB
    idx_p = jnp.pad(idx, (0, mp_pad - mp))
    sx_p = jnp.pad(sx, (0, mp_pad - mp))
    sy_p = jnp.pad(sy, (0, mp_pad - mp))
    tf_p = jnp.pad(tile_f, (0, mp_pad - mp))
    is_x, is_y, is_tile = (jnp.asarray(m)[:, None] for m in _loc_masks())
    out = jnp.zeros((f, mp_pad), src.dtype)

    def body(s, out):
        o = s * _FM_SLAB
        sl = jax.lax.dynamic_slice(idx_p, (o,), (_FM_SLAB,))
        rows = jnp.take(src, sl, axis=0).T        # (F, SLAB): bounded temp
        loc = (rows * (1.0 - is_tile)
               - is_x * jax.lax.dynamic_slice(sx_p, (o,), (_FM_SLAB,))[None]
               - is_y * jax.lax.dynamic_slice(sy_p, (o,), (_FM_SLAB,))[None]
               + is_tile * jax.lax.dynamic_slice(tf_p, (o,),
                                                 (_FM_SLAB,))[None])
        return jax.lax.dynamic_update_slice(out, loc, (0, o))

    out = jax.lax.fori_loop(0, slabs, body, out)
    return out[:, :mp] if mp_pad != mp else out


def _gather_pairs_fm_fwd(records_rank, sorted_rank, sx, sy, tile_f, lo, hi):
    return _gather_pairs_fm(records_rank, sorted_rank, sx, sy, tile_f,
                            lo, hi), (sorted_rank, lo, hi)


# Record rows that can carry a nonzero pair-gradient. The rasterizer
# backward writes EXACT zeros for the bbox, tile-id and constant-one rows
# (rasterize_pallas._bwd_group builds d_chunk with zero columns there), and
# pair_records has no other differentiable consumer, so the feature-major
# backward sorts/scans only these 10 of 16 rows -- the peak-memory term at
# dense pair counts (the 29M-pair honest-dense step previously exceeded the
# chip's HLO-temp ceiling, PERF.md).
_GRAD_ROWS = (P.REC_MEAN_X, P.REC_MEAN_Y, P.REC_CONIC_A, P.REC_CONIC_B,
              P.REC_CONIC_C, P.REC_OPACITY, P.REC_COLOR_R, P.REC_COLOR_G,
              P.REC_COLOR_B, P.REC_DEPTH)


def _gather_pairs_fm_bwd(res, g):
    sorted_rank, lo, hi = res
    f, mp = g.shape
    # emission order via stable sorts (dense 1-D operands only), gradient
    # rows only, in two half-width batches: each stable sort of the same
    # key yields the identical permutation, and the in+out operand
    # footprint (the peak-memory term at 30M pairs) stays bounded.
    act = list(_GRAD_ROWS)
    fa = len(act)
    g_em = []
    for rows in (act[:fa // 2], act[fa // 2:]):
        ops = (sorted_rank,) + tuple(g[c] for c in rows)
        g_em.extend(jax.lax.sort(ops, dimension=0, is_stable=True,
                                 num_keys=1)[1:])
    g_em = jnp.stack(g_em, axis=0)                           # (FA, MP)
    b = _CUM_BLOCK
    nb = -(-mp // b)
    gp = jnp.pad(g_em, ((0, 0), (0, (nb + 1) * b - mp)))
    fine = jnp.cumsum(gp.reshape(fa, nb + 1, b), axis=2)
    totals = fine[:, :, -1]                                  # (FA, NB+1)
    coarse = jnp.cumsum(totals, axis=1) - totals             # exclusive
    fine_flat = fine.reshape(fa, (nb + 1) * b)

    def excl_at(idx):
        # exclusive intra-block prefix WITHOUT materializing a second
        # full-stream fine_ex copy (~2 GB at 30M pairs): the exclusive
        # value at flat index i is 0 on a block boundary, else fine[i-1]
        v = jnp.take(fine_flat, jnp.maximum(idx - 1, 0), axis=1)
        return jnp.where((idx % b == 0)[None, :], 0.0, v)

    chi = jnp.take(coarse, hi // b, axis=1)
    clo = jnp.take(coarse, lo // b, axis=1)
    d_act = (chi - clo) + (excl_at(hi) - excl_at(lo))        # (FA, N)
    d_records = jnp.zeros((f, lo.shape[0]), g.dtype)
    for i, c in enumerate(act):
        d_records = jax.lax.dynamic_update_slice(
            d_records, d_act[i:i + 1], (c, 0))
    return d_records.T, None, None, None, None, None, None   # (N, F)


_gather_pairs_fm.defvjp(_gather_pairs_fm_fwd, _gather_pairs_fm_bwd)


def bin_gaussians(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    config: RasterizerConfig = RasterizerConfig(),
    max_pairs: Optional[int] = None,
) -> TileBins:
    ts = config.tile_size
    ntx, nty = tile_grid(width, height, ts)
    num_tiles = ntx * nty
    n = proj.depth.shape[0]
    if max_pairs is None:
        max_pairs = config.pairs_per_gaussian * n
    max_pairs = round_up(max_pairs, config.chunk_size)
    # One extra chunk of sentinel-keyed slots so the rasterizer's last
    # 128-lane DMA window never reads out of bounds. Allocating it here
    # (emission is simply capped below max_pairs) instead of concatenating
    # after the fact avoids materializing a second copy of the multi-GB
    # record stream at dense pair counts.
    mp_alloc = max_pairs + config.chunk_size
    if mp_alloc > _FM_PAIR_THRESHOLD:
        # feature-major path: round the pool to a whole number of gather
        # slabs so the slab loop writes the output exactly (a trailing
        # slice would copy the ~2 GB stream once more); extra slots are
        # sentinel-keyed like the overhang chunk
        mp_alloc = round_up(mp_alloc, _FM_SLAB)

    # 1. depth sort, invalid last (ref: global z argsort, gaussian_scene.py:117)
    depth_key = jnp.where(proj.valid, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key)                              # (N,) int32

    mean2d = jax.lax.stop_gradient(proj.mean2d)[order]
    radius = jax.lax.stop_gradient(proj.radius)[order]
    valid = proj.valid[order]

    min_x = jnp.floor(mean2d[:, 0] - radius)
    max_x = jnp.ceil(mean2d[:, 0] + radius)
    min_y = jnp.floor(mean2d[:, 1] - radius)
    max_y = jnp.ceil(mean2d[:, 1] + radius)

    # 2. tile spans. Reference's overlap test admits a bbox touching the
    # first pixel of the next tile (gaussian_scene.py:209-218) -> the lower
    # tile bound shifts by one under compat.inclusive_tile_overlap.
    if config.compat.inclusive_tile_overlap:
        tx0 = jnp.ceil(min_x / ts).astype(jnp.int32) - 1
        ty0 = jnp.ceil(min_y / ts).astype(jnp.int32) - 1
    else:
        tx0 = jnp.floor(min_x / ts).astype(jnp.int32)
        ty0 = jnp.floor(min_y / ts).astype(jnp.int32)
    tx1 = jnp.floor(max_x / ts).astype(jnp.int32)
    ty1 = jnp.floor(max_y / ts).astype(jnp.int32)

    # intersect with the grid; an empty intersection (bbox fully off-screen)
    # must yield span 0, so only the outward bound is clamped on each side
    tx0 = jnp.maximum(tx0, 0)
    ty0 = jnp.maximum(ty0, 0)
    tx1 = jnp.minimum(tx1, ntx - 1)
    ty1 = jnp.minimum(ty1, nty - 1)
    span_x = jnp.clip(tx1 - tx0 + 1, 0, config.max_span)
    span_y = jnp.clip(ty1 - ty0 + 1, 0, config.max_span)
    counts = jnp.where(valid, span_x * span_y, 0)               # (N,)

    # 3. slot offsets. Overflow policy: drop WHOLE gaussians far-to-near
    # (the dropped set is a suffix of the depth ranking, since offsets are
    # monotone), so per-tile ranges stay exact even when capacity overflows.
    offsets = jnp.concatenate(
        [jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)])    # (N+1,)
    total = offsets[-1]
    full = offsets[1:] <= max_pairs                             # fits entirely
    total_emit = jnp.max(jnp.where(full, offsets[1:], 0))

    # 4. ragged expand, gather-light. rank[p] = (number of i >= 1 with
    # offsets[i] <= p) is a scatter of ones at each gaussian's end offset
    # followed by a cumulative sum -- O(MP) log-depth scan, far cheaper on
    # TPU than searchsorted's 20 serial gather passes. The per-pair geometry
    # (start offset, span_x, tx0, ty0) rides ONE row gather of a packed
    # (N, 4) matrix: XLA TPU gathers pay per ROW, so four s32[MP] element
    # gathers (~2.7 ms each at treehill scale) collapse into one ~0.6 ms
    # row gather.
    p = jnp.arange(mp_alloc, dtype=jnp.int32)
    marks = jnp.zeros((mp_alloc,), jnp.int32).at[offsets[1:]].add(
        1, mode="drop")                   # offsets >= MP_alloc fall off
    rank = jnp.clip(jnp.cumsum(marks), 0, n - 1)                # (MP,) depth rank
    geom = jnp.stack([offsets[:-1], span_x, tx0, ty0], axis=1)  # (N, 4)

    def _decode_tile(gp_rows, pp):
        k = pp - gp_rows[:, 0]
        dx = k % jnp.maximum(gp_rows[:, 1], 1)
        dy = k // jnp.maximum(gp_rows[:, 1], 1)
        return (gp_rows[:, 3] + dy) * ntx + (gp_rows[:, 2] + dx)

    if mp_alloc > _FM_PAIR_THRESHOLD:
        # the (MP, 4) row gather tiles as T(8,128): its 4-wide minor dim
        # pads 32x (observed: 15 GB of HLO temp at the 31M-pair
        # honest-dense pool). Slab it like the record gather so the padded
        # temp stays ~1 GB (mp_alloc is slab-rounded above).
        def body(s, tid):
            o = s * _FM_SLAB
            rk = jax.lax.dynamic_slice(rank, (o,), (_FM_SLAB,))
            pp = jax.lax.dynamic_slice(p, (o,), (_FM_SLAB,))
            t = _decode_tile(jnp.take(geom, rk, axis=0), pp)
            return jax.lax.dynamic_update_slice(tid, t, (o,))

        tile_id = jax.lax.fori_loop(
            0, mp_alloc // _FM_SLAB, body,
            jnp.zeros((mp_alloc,), jnp.int32))
    else:
        tile_id = _decode_tile(jnp.take(geom, rank, axis=0), p)
    emitted = p < total_emit
    # sentinel id for non-emitted slots: sorts after every real tile AND
    # falls outside every group's [g*GT, (g+1)*GT) range, so the rasterizer
    # masks overhang lanes by segment arithmetic alone
    gt = config.group_tiles
    num_groups = num_groups_for(num_tiles, config)
    sentinel = num_groups * gt
    tile_key = jnp.where(emitted, tile_id, sentinel).astype(jnp.int32)

    # 5. stable sort by tile: depth order preserved within a tile. The
    # permutation and its inverse feed the gather-only backward of
    # _gather_pairs (the inverse-sort is dead code in forward-only graphs).
    sorted_keys, sorted_rank, perm = jax.lax.sort(
        (tile_key, rank, p), dimension=0, is_stable=True, num_keys=1)
    _, inv_perm = jax.lax.sort_key_val(perm, p)
    pair_valid = sorted_keys < num_tiles

    # 6. per-tile ranges WITHOUT searchsorted (binary search = 20 serial
    # gather passes, measured ~9 ms per call at treehill scale): every
    # emitted gaussian covers a clamped tile rectangle, so per-tile pair
    # counts are a sum of axis-aligned indicator rectangles -- scatter the
    # four signed corners of each rectangle and take a 2D prefix sum.
    # Starts follow as the exclusive cumsum (sorted order is tile-major).
    w = (valid & full & (counts > 0)).astype(jnp.int32)
    ntx1, nty1 = ntx + 1, nty + 1
    txe = tx0 + span_x                   # exclusive right tile bound
    tye = ty0 + span_y
    corner_idx = jnp.concatenate([
        ty0 * ntx1 + tx0, ty0 * ntx1 + txe, tye * ntx1 + tx0, tye * ntx1 + txe])
    corner_upd = jnp.concatenate([w, -w, -w, w])
    grid_sum = jnp.zeros((nty1 * ntx1,), jnp.int32).at[corner_idx].add(
        corner_upd, mode="drop")
    cnt2d = jnp.cumsum(jnp.cumsum(grid_sum.reshape(nty1, ntx1), axis=0), axis=1)
    tile_counts = cnt2d[:nty, :ntx].reshape(-1)
    tile_starts = (jnp.cumsum(tile_counts) - tile_counts).astype(jnp.int32)

    # 7. gather records into pair order (differentiable) and re-express
    # means/bboxes in the owning tile's local pixel frame, so the rasterizer
    # shares one constant pixel-coordinate iota across every tile in flight.
    # Feature-major (NUM_REC_ROWS, MP): dense f32 layout (see projection.py).
    # Chained row takes (depth order first, then pair order) instead of one
    # take by order[sorted_rank]: composing the indices costs a slow s32[MP]
    # element gather, while the extra (N, 16) row take is ~free. The second
    # take uses the custom gather-only VJP above (emission-contiguous
    # cumsum-diff reduction); the first transposes to a tiny (N, 16)
    # permutation scatter.
    records_rank = jnp.take(pack_records(proj).T, order, axis=0)  # (N, 16)
    lo = jnp.minimum(offsets[:-1], total_emit).astype(jnp.int32)
    hi = jnp.minimum(offsets[1:], total_emit).astype(jnp.int32)
    # Localization selectors: which features shift by the tile origin /
    # take the tile id.
    tile_f = sorted_keys.astype(jnp.float32)
    sx = jnp.where(pair_valid, (sorted_keys % ntx) * ts, 0).astype(jnp.float32)
    sy = jnp.where(pair_valid, (sorted_keys // ntx) * ts, 0).astype(jnp.float32)
    if mp_alloc > _FM_PAIR_THRESHOLD:
        # large pools: feature-major end to end -- a pair-major (MP, 16)
        # intermediate would 8x-pad to multiple chip memories (see
        # _gather_pairs_fm; gather + localization fused per slab)
        pair_records = _gather_pairs_fm(records_rank, sorted_rank, sx, sy,
                                        tile_f, lo, hi)         # (16, MP)
    else:
        mx = _loc_masks()
        is_x, is_y, is_tile = (jnp.asarray(m) for m in mx)
        # Localization as one fused elementwise pass over (MP, 16) followed
        # by a single dense (MP, 16) -> (16, MP) transpose. (A per-column
        # stack reads strided columns: measured ~4 ms; this ~1 ms.)
        pr = _gather_pairs(records_rank, sorted_rank, inv_perm, lo, hi)
        pr = (pr * (1.0 - is_tile)[None, :] - sx[:, None] * is_x[None, :]
              - sy[:, None] * is_y[None, :]
              + tile_f[:, None] * is_tile[None, :])
        pair_records = pr.T                                     # (16, MP)

    # group ranges: tiles are contiguous in the sorted pair stream, so a
    # group of GT consecutive tiles is one contiguous pair range, found by
    # binary search over the sorted keys (log2(MP) rounds of ~NG gathers).
    # Derived from sorted_keys, NOT tile_starts: the rasterizer then has no
    # data dependency on the per-tile histogram, so XLA dead-code-eliminates
    # the corner scatter-add (~1.4 ms) from render graphs; tile_starts stays
    # available for aux consumers.
    boundaries = jnp.arange(num_groups + 1, dtype=jnp.int32) * gt
    group_starts = jnp.searchsorted(
        sorted_keys, boundaries, side="left").astype(jnp.int32)

    return TileBins(
        pair_records=pair_records,
        pair_rank=sorted_rank.astype(jnp.int32),
        pair_valid=pair_valid,
        tile_starts=tile_starts,
        tile_counts=tile_counts.astype(jnp.int32),
        group_starts=group_starts,
        num_pairs=total.astype(jnp.int32),
        overflowed=total > max_pairs,
    )
