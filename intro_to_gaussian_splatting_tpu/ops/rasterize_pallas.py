"""Pallas TPU rasterizer: group-streamed forward + hand-derived backward.

TPU-native replacement for the reference CUDA kernel (splat/c/render.cu).
The design is architectural, not a translation:

  * The CUDA kernel runs one thread per pixel, scanning ALL gaussians with a
    per-thread bbox reject and `break` (render.cu:49-81). A first TPU cut ran
    one grid step per 16x16 tile, but a treehill-size frame has ~66k tiles
    and the sequential Mosaic grid made per-step overhead the bottleneck.
    Here the grid is one program per GROUP of `group_tiles` consecutive
    tiles (~1k steps per frame): because the binning pass (ops/binning.py)
    emits pairs sorted by (tile, depth), a group's pairs are one contiguous
    range of the pair stream, which the kernel consumes in fixed 128-lane
    chunks with double-buffered HBM->VMEM DMA -- empty tiles cost nothing.
  * Records are FEATURE-MAJOR (16 rows, MAX_PAIRS lanes): f32 arrays tile as
    (8, 128), so a pair-major (MAX_PAIRS, 16) layout would pad every row to
    128 lanes and waste 8x HBM footprint and bandwidth; feature-major is
    dense. Each chunk is transposed once in VMEM to give per-pair features
    on sublanes and the tile's 256 pixels on lanes.
  * A chunk may span many tiles, so per-tile state is handled by SEGMENTED
    operations keyed on the record's tile-id row: front-to-back
    transmittance is a segmented multiplicative Hillis-Steele scan along
    sublanes (exact because tiles are contiguous in the sorted stream), and
    per-tile accumulation is a one-hot matmul -- (group_tiles, C) selector
    against (C, 256) weights -- which the MXU does at full throughput.
    Means and bboxes are stored TILE-LOCAL so pixel coordinates are a
    constant iota, shared by every tile in flight.
  * "break" becomes the lane-masked `include` test -- exact because T is
    monotone when alpha <= alpha_clamp < 1 (see ops/compositing.py).
  * The backward pass (absent in the reference -- nothing ever backprops
    through its renderer, SURVEY.md section 0) runs in FORWARD order: the
    per-tile suffix sums it needs come from `u_all[tile] - prefix`, where
    u_all is recovered from the forward output block, so no back-to-front
    sweep and no per-gaussian state is stored.

Per-pair gradients are written as 128-aligned lane windows by the owning
group (the leading partial window merges the previous group's already
written values -- the TPU grid is sequential by construction), then
scatter-added to gaussian slots by the autodiff transpose of the binning
gather.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from intro_to_gaussian_splatting_tpu.config import RasterizerConfig
from intro_to_gaussian_splatting_tpu.models.camera import Camera
from intro_to_gaussian_splatting_tpu.models.gaussians import GaussianModel
from intro_to_gaussian_splatting_tpu.ops import projection as P
from intro_to_gaussian_splatting_tpu.ops.binning import (
    bin_gaussians, num_groups_for, tile_grid,
)
from intro_to_gaussian_splatting_tpu.ops.projection import project_gaussians

# Output channels per tile pixel: [r, g, b, depth, alpha]. The channel dim
# is not a Mosaic tiling dim of the (1, C, GT, ts*ts) output block, so it
# needs no power-of-two padding.
OUT_CHANNELS = 5
# Lane alignment of chunk DMA windows (f32 lane tiling is 128).
_LANE_ALIGN = 128
_HI = jax.lax.Precision.HIGHEST
_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,   # 6 bf16 MXU passes (exact f32)
    "default": jax.lax.Precision.DEFAULT,   # 1 pass (raw bf16)
}


def _oh_dot(oh, mat, config: RasterizerConfig):
    """One-hot selector @ f32 payload matrix, contracting oh's last dim.

    ``oh`` contains only {0, 1} -- exactly representable in bf16 -- so the
    product needs full precision only on ``mat``. "split3" decomposes mat
    into three bf16 terms (hi/mid/lo ~ 24 mantissa bits, each split exact
    by Sterbenz) and issues THREE single-pass bf16 MXU matmuls: exact to
    ~1 f32 ulp at HALF the MXU work of f32 HIGHEST (6 passes). Mosaic
    refuses to lower the jax-level 3-pass HIGH; this is the hand-rolled
    equivalent. Replaces the per-channel f32 dots that mirrored the
    per-thread scalar accumulation of the reference CUDA kernel
    (splat/c/render.cu:49-81).
    """
    dims = (((1,), (0,)), ((), ()))
    if config.accum_precision == "split3":
        ohb = oh.astype(jnp.bfloat16)
        hi = mat.astype(jnp.bfloat16)
        r1 = mat - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        out = None
        for part in (hi, mid, lo):
            d = jax.lax.dot_general(ohb, part, dims,
                                    preferred_element_type=jnp.float32)
            out = d if out is None else out + d
        return out
    return jax.lax.dot_general(
        oh, mat, dims, precision=_PRECISIONS[config.accum_precision],
        preferred_element_type=jnp.float32)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _local_pixel_coords(ts: int):
    """Tile-local pixel coords (row-major lane order) as two (1, ts*ts) f32."""
    pix = ts * ts
    l = jax.lax.broadcasted_iota(jnp.int32, (1, pix), 1)
    return (l % ts).astype(jnp.float32), (l // ts).astype(jnp.float32)


def _shift_down_sub(x, k, fill):
    """Shift +k along sublanes (axis 0); rows [0, k) filled with `fill`.

    Written as a circular roll + iota select: Mosaic lowers sublane rotates
    natively, whereas pad+concat at non-multiple-of-8 offsets does not lower.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    rolled = pltpu.roll(x, shift=k, axis=0)
    return jnp.where(rows < k, jnp.asarray(fill, x.dtype), rolled)


def seg_scan_mult(x: jax.Array, seg: jax.Array) -> jax.Array:
    """Segmented inclusive prefix PRODUCT along sublanes.

    x: (C, PIX); seg: (C, 1) segment ids (contiguous runs). Hillis-Steele:
    log2(C) shift-multiply steps; the `seg[j-k] == seg[j]` test is exact for
    contiguous segments. Multiplicative form needs no log/exp: factors are
    (1 - alpha) in [0.01, 1], and underflow to 0 is a saturated pixel.
    """
    c = x.shape[0]
    k = 1
    while k < c:
        same = seg == _shift_down_sub(seg, k, -1.0)
        x = x * jnp.where(same, _shift_down_sub(x, k, 1.0), 1.0)
        k *= 2
    return x


def seg_scan_add(x: jax.Array, seg: jax.Array) -> jax.Array:
    """Segmented inclusive prefix sum along sublanes. Same scheme, additive."""
    c = x.shape[0]
    k = 1
    while k < c:
        same = seg == _shift_down_sub(seg, k, -1.0)
        x = x + jnp.where(same, _shift_down_sub(x, k, 0.0), 0.0)
        k *= 2
    return x


def _col(rec_t, c):
    """Feature column c of the transposed (C, 16) chunk as (C, 1)."""
    return rec_t[:, c:c + 1]


def _alpha_terms(rec_t, px, py, gmask, config: RasterizerConfig):
    """Per-chunk alpha evaluation; pairs on sublanes, pixels on lanes.

    rec_t: (C, 16) transposed records with TILE-LOCAL means/bboxes;
    px, py: (1, PIX) local coords; gmask: (C, 1) validity.
    Semantics identical to ops/compositing.py:gaussian_alpha/effective_alpha
    (ref utils.py:357-365, gaussian_scene.py:164, render.cu:55-71).
    """
    dx = px - _col(rec_t, P.REC_MEAN_X)
    dy = py - _col(rec_t, P.REC_MEAN_Y)
    q = (_col(rec_t, P.REC_CONIC_A) * dx * dx
         + 2.0 * _col(rec_t, P.REC_CONIC_B) * dx * dy
         + _col(rec_t, P.REC_CONIC_C) * dy * dy)
    weight = jnp.exp(-0.5 * q)
    alpha_raw = _col(rec_t, P.REC_OPACITY) * weight
    a = jnp.clip(alpha_raw, 0.0, config.alpha_clamp)
    if config.alpha_min > 0.0:
        a = jnp.where(alpha_raw >= config.alpha_min, a, 0.0)
    if config.compat.pixel_bbox_test:
        # CUDA path rejects pixels outside the gaussian's own bbox
        # (render.cu:55-60); bbox tests are inclusive on both ends.
        inb = ((px >= _col(rec_t, P.REC_MIN_X))
               & (px <= _col(rec_t, P.REC_MAX_X))
               & (py >= _col(rec_t, P.REC_MIN_Y))
               & (py <= _col(rec_t, P.REC_MAX_Y)))
        a = jnp.where(inb, a, 0.0)
    a = a * gmask
    return dx, dy, weight, alpha_raw, a


def _chunk_geometry(gs_ref, g, chunk: int):
    """Window geometry of group g's pair range: (astart, nchunks, base_tile_f)."""
    start = gs_ref[g]
    stop = gs_ref[g + 1]
    astart = (start // _LANE_ALIGN) * _LANE_ALIGN
    end = stop - astart
    nchunks = jnp.where(stop == start, 0, pl.cdiv(end, chunk))
    return astart, nchunks


def _seg_state(rec, rec_t, g, gt: int):
    """Per-chunk segment arrays from the tile-id record row.

    Returns (seg (C,1) f32 tile ids, tl_row (1,C) / tl_sub (C,1) group-local
    ids, inrange (C,1) f32 mask). Lanes owned by other groups (window
    overhang) or padding (sentinel id) fall outside [0, gt): masked out.
    """
    base = (g * gt).astype(jnp.float32)
    seg = _col(rec_t, P.REC_TILE)
    tl_row = rec[P.REC_TILE:P.REC_TILE + 1, :] - base
    tl_sub = seg - base
    inrange = ((tl_sub >= 0.0) & (tl_sub < float(gt))).astype(jnp.float32)
    return seg, tl_row, tl_sub, inrange


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(gs_ref, rec_hbm, out_ref, rec_vmem, sem,
                *, gt: int, config: RasterizerConfig):
    ts = config.tile_size
    chunk = config.chunk_size
    pix = ts * ts
    gps = config.groups_per_step
    p0 = pl.program_id(0)
    px, py = _local_pixel_coords(ts)
    rows_gt = jax.lax.broadcasted_iota(jnp.int32, (gt, chunk), 0).astype(
        jnp.float32)

    def run_group(j):
        """One tile group; gps of these share a grid step (and its ~3 us
        dispatch overhead -- at treehill scale the overhead would otherwise
        dominate the kernel)."""
        g = p0 * gps + j
        astart, nchunks = _chunk_geometry(gs_ref, g, chunk)

        out_ref[j] = jnp.zeros((OUT_CHANNELS, gt, pix), jnp.float32)

        def chunk_dma(i):
            slot = i % 2
            return pltpu.make_async_copy(
                rec_hbm.at[:, pl.ds(astart + i * chunk, chunk)],
                rec_vmem.at[slot], sem.at[slot])

        def body(i, carry):
            # invariant: DMA for chunk i is in flight on entry (slot i % 2)
            t_carry, seg_carry = carry

            @pl.when(i + 1 < nchunks)
            def _():
                chunk_dma(i + 1).start()
            chunk_dma(i).wait()
            rec = rec_vmem[i % 2]                   # (16, C) feature-major
            rec_t = jnp.swapaxes(rec, 0, 1)         # (C, 16) pair-major
            seg, tl_row, _, inrange = _seg_state(rec, rec_t, g, gt)

            _, _, _, _, a = _alpha_terms(rec_t, px, py, inrange, config)
            one_minus = 1.0 - a
            t_incl = seg_scan_mult(one_minus, seg)              # (C, PIX)
            t_excl = jnp.where(seg == _shift_down_sub(seg, 1, -1.0),
                               _shift_down_sub(t_incl, 1, 1.0), 1.0)
            # cross-chunk carry applies only to the continuing segment
            cont = seg == seg_carry                              # (C, 1)
            T = t_excl * jnp.where(cont, t_carry, 1.0)
            include = (T * one_minus >= config.t_threshold).astype(
                jnp.float32)
            w = T * a * include                                  # (C, PIX)

            # per-tile accumulation: one-hot selector x weights, on the MXU.
            # The 5 payload channels are weighted on the VPU and stacked
            # laterally into ONE (C, 5*PIX) operand so every precision pass
            # is a single wide matmul (fewer, larger MXU ops).
            oh = (rows_gt == tl_row).astype(jnp.float32)         # (GT, C)
            wcat = jnp.concatenate(
                [_col(rec_t, P.PAYLOAD_START + c) * w
                 for c in range(P.NUM_PAYLOAD)], axis=1)         # (C, 5*PIX)
            big = _oh_dot(oh, wcat, config)                      # (GT, 5*PIX)
            for c in range(P.NUM_PAYLOAD):
                out_ref[j, c] = out_ref[j, c] + big[:, c * pix:(c + 1) * pix]

            t_incl_full = t_incl * jnp.where(cont, t_carry, 1.0)
            return (t_incl_full[chunk - 1:chunk, :], seg[chunk - 1:chunk, :])

        @pl.when(nchunks > 0)
        def _():
            chunk_dma(0).start()

        t0 = jnp.ones((1, pix), jnp.float32)
        seg0 = jnp.full((1, 1), -1.0, jnp.float32)
        jax.lax.fori_loop(0, nchunks, body, (t0, seg0))

    for j in range(gps):
        run_group(j)


def _fwd_pallas(records, group_starts, num_groups: int,
                config: RasterizerConfig, interpret: bool):
    ts = config.tile_size
    pix = ts * ts
    gt = config.group_tiles
    gps = config.groups_per_step
    assert num_groups % gps == 0, \
        "num_groups must come from binning.num_groups_for (gps-padded)"
    kernel = functools.partial(_fwd_kernel, gt=gt, config=config)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_groups // gps,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (gps, OUT_CHANNELS, gt, pix), lambda g, s: (g, 0, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, P.NUM_REC_ROWS, config.chunk_size),
                           jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (num_groups, OUT_CHANNELS, gt, pix), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(group_starts, records)


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(gs_ref, rec_hbm, out_blk, g_blk, drec_hbm,
                rec_vmem, drec_vmem, sem_in, sem_out, sem_merge,
                *, gt: int, config: RasterizerConfig):
    ts = config.tile_size
    chunk = config.chunk_size
    pix = ts * ts
    gps = config.groups_per_step
    p0 = pl.program_id(0)
    px, py = _local_pixel_coords(ts)
    cols_gt = jax.lax.broadcasted_iota(jnp.int32, (chunk, gt), 1).astype(
        jnp.float32)

    for j in range(gps):
        _bwd_group(j, p0 * gps + j, gs_ref, rec_hbm, out_blk, g_blk,
                   drec_hbm, rec_vmem, drec_vmem, sem_in, sem_out,
                   sem_merge, px, py, cols_gt, gt=gt, config=config)


def _bwd_group(j, g, gs_ref, rec_hbm, out_blk, g_blk, drec_hbm,
               rec_vmem, drec_vmem, sem_in, sem_out, sem_merge,
               px, py, cols_gt, *, gt: int, config: RasterizerConfig):
    ts = config.tile_size
    chunk = config.chunk_size
    pix = ts * ts
    astart, nchunks = _chunk_geometry(gs_ref, g, chunk)

    # u_all[tl, p] = sum_j gc[j, p] * W[j, p] over ALL pairs of tile tl
    #             = sum_c g[c, tl, p] * out[c, tl, p] (out = payload @ W)
    u_all = jnp.zeros((gt, pix), jnp.float32)
    for c in range(P.NUM_PAYLOAD):
        u_all = u_all + g_blk[j, c] * out_blk[j, c]
    # one (GT, 6*PIX) matrix so the per-chunk tile-indexed rows come from a
    # single one-hot matmul instead of six
    gcat = jnp.concatenate(
        [g_blk[j, c] for c in range(P.NUM_PAYLOAD)] + [u_all], axis=1)

    def in_dma(i):
        slot = i % 2
        return pltpu.make_async_copy(
            rec_hbm.at[:, pl.ds(astart + i * chunk, chunk)],
            rec_vmem.at[slot], sem_in.at[slot])

    def out_dma(i):
        slot = i % 2
        return pltpu.make_async_copy(
            drec_vmem.at[slot],
            drec_hbm.at[:, pl.ds(astart + i * chunk, chunk)],
            sem_out.at[slot])

    def body(i, carry):
        # invariant: input DMA for chunk i is in flight on entry (slot i % 2)
        t_carry, seg_carry, u_carry = carry
        slot = i % 2

        @pl.when(i + 1 < nchunks)
        def _():
            in_dma(i + 1).start()
        # while records stream in, fetch the previous group's gradients
        # already present in the first (128-lane-aligned) window
        merge_dma = pltpu.make_async_copy(
            drec_hbm.at[:, pl.ds(astart, chunk)], drec_vmem.at[0], sem_merge)

        @pl.when(i == 0)
        def _():
            merge_dma.start()
        in_dma(i).wait()

        @pl.when(i == 0)
        def _():
            merge_dma.wait()
        rec = rec_vmem[slot]
        rec_t = jnp.swapaxes(rec, 0, 1)
        seg, tl_row, tl_sub, inrange = _seg_state(rec, rec_t, g, gt)

        dx, dy, weight, alpha_raw, a = _alpha_terms(
            rec_t, px, py, inrange, config)
        one_minus = 1.0 - a
        t_incl = seg_scan_mult(one_minus, seg)
        t_excl = jnp.where(seg == _shift_down_sub(seg, 1, -1.0),
                           _shift_down_sub(t_incl, 1, 1.0), 1.0)
        cont = seg == seg_carry
        T = t_excl * jnp.where(cont, t_carry, 1.0)
        include = (T * one_minus >= config.t_threshold).astype(jnp.float32)
        W = T * a * include

        # per-pair rows of the tile-indexed cotangent / forward outputs
        oh_t = (cols_gt == tl_sub).astype(jnp.float32)           # (C, GT)
        big = _oh_dot(oh_t, gcat, config)                        # (C, 6*PIX)
        gtile = [big[:, c * pix:(c + 1) * pix]
                 for c in range(P.NUM_PAYLOAD)]                  # (C, PIX) x5
        gc = sum(_col(rec_t, P.PAYLOAD_START + c) * gtile[c]
                 for c in range(P.NUM_PAYLOAD))
        u_all_row = big[:, P.NUM_PAYLOAD * pix:]

        u = gc * W
        prefix = seg_scan_add(u, seg) + jnp.where(cont, u_carry, 0.0)
        suffix = u_all_row - prefix
        da = gc * T * include - suffix / one_minus

        # chain rule a = clip(alpha_raw, 0, clamp) * masks
        passthrough = ((a > 0.0) & (alpha_raw < config.alpha_clamp)
                       ).astype(jnp.float32)
        dalpha = da * passthrough                                # (C, PIX)

        op = _col(rec_t, P.REC_OPACITY)
        ca = _col(rec_t, P.REC_CONIC_A)
        cb = _col(rec_t, P.REC_CONIC_B)
        cc = _col(rec_t, P.REC_CONIC_C)
        dop = jnp.sum(dalpha * weight, axis=1, keepdims=True)    # (C, 1)
        dq = dalpha * op * weight * (-0.5)                       # dL/d(power)
        dca = jnp.sum(dq * dx * dx, axis=1, keepdims=True)
        dcb = jnp.sum(dq * 2.0 * dx * dy, axis=1, keepdims=True)
        dcc = jnp.sum(dq * dy * dy, axis=1, keepdims=True)
        dmx = jnp.sum(dq * (-(2.0 * ca * dx + 2.0 * cb * dy)),
                      axis=1, keepdims=True)
        dmy = jnp.sum(dq * (-(2.0 * cc * dy + 2.0 * cb * dx)),
                      axis=1, keepdims=True)
        # dpayload[j, c] = sum_p W[j, p] * g[c, tl_j, p]  (4 rows: rgb+depth;
        # the "one" payload row is constant)
        dpay = [jnp.sum(W * gtile[c], axis=1, keepdims=True) for c in range(4)]

        zero = jnp.zeros((chunk, 1), jnp.float32)
        d_chunk_t = jnp.concatenate(
            [dmx, dmy, dca, dcb, dcc, dop,
             zero, zero, zero, zero, zero]                       # bbox + tile
            + dpay + [zero],
            axis=1)                                              # (C, 16)
        d_chunk = jnp.swapaxes(d_chunk_t, 0, 1)                  # (16, C)
        # First chunk: lanes before the group's true start hold the previous
        # group's already-written gradients (the aligned window overlaps its
        # range) -- keep them. The grid is sequential and every group drains
        # its outstanding writes before finishing, so they are visible.
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (P.NUM_REC_ROWS, chunk), 1)
        keep_prev = jnp.logical_and(i == 0, lane + astart < gs_ref[g])
        # reuse of this slot's buffer: its write from chunk i-2 must be done
        @pl.when(i >= 2)
        def _():
            out_dma(i - 2).wait()
        drec_vmem[slot] = jnp.where(keep_prev, drec_vmem[slot], d_chunk)
        out_dma(i).start()

        t_incl_full = t_incl * jnp.where(cont, t_carry, 1.0)
        u_incl_full = prefix
        return (t_incl_full[chunk - 1:chunk, :],
                seg[chunk - 1:chunk, :],
                u_incl_full[chunk - 1:chunk, :])

    @pl.when(nchunks > 0)
    def _():
        in_dma(0).start()

    t0 = jnp.ones((1, pix), jnp.float32)
    seg0 = jnp.full((1, 1), -1.0, jnp.float32)
    u0 = jnp.zeros((1, pix), jnp.float32)
    jax.lax.fori_loop(0, nchunks, body, (t0, seg0, u0))

    # drain the (up to two) outstanding gradient writes so the next group's
    # merge-read observes them
    @pl.when(nchunks >= 2)
    def _():
        out_dma(nchunks - 2).wait()

    @pl.when(nchunks >= 1)
    def _():
        out_dma(nchunks - 1).wait()


def _bwd_pallas(records, group_starts, tile_out, g_tile, num_groups: int,
                config: RasterizerConfig, interpret: bool):
    ts = config.tile_size
    pix = ts * ts
    gt = config.group_tiles
    gps = config.groups_per_step
    assert num_groups % gps == 0, \
        "num_groups must come from binning.num_groups_for (gps-padded)"
    kernel = functools.partial(_bwd_kernel, gt=gt, config=config)
    blk = pl.BlockSpec((gps, OUT_CHANNELS, gt, pix),
                       lambda g, s: (g, 0, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_groups // gps,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY), blk, blk],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, P.NUM_REC_ROWS, config.chunk_size),
                           jnp.float32),
                pltpu.VMEM((2, P.NUM_REC_ROWS, config.chunk_size),
                           jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(records.shape, jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True),
    )(group_starts, records, tile_out, g_tile)


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def rasterize_pairs(records, group_starts, num_groups: int,
                    config: RasterizerConfig, interpret: bool):
    """records (NUM_REC_ROWS, MP) -> (num_groups, OUT_CHANNELS, GT, ts*ts).

    CONTRACT: MP is a multiple of config.chunk_size AND the caller
    guarantees at least one trailing chunk of sentinel-keyed slots
    (tile row outside every group's range) beyond group_starts[-1], so the
    last 128-lane DMA window never reads out of bounds. Both binning paths
    (ops.binning.bin_gaussians, parallel.sharded._ring_bin_strip) allocate
    that chunk; padding here instead would materialize a second copy of
    the record stream (~2 GB at dense treehill pair counts).
    group_starts: (num_groups + 1,) int32 pair offsets of each tile group.
    """
    tile_out, _ = _rasterize_fwd_impl(records, group_starts, num_groups,
                                      config, interpret)
    return tile_out


def _rasterize_fwd_impl(records, group_starts, num_groups, config, interpret):
    assert records.shape[0] == P.NUM_REC_ROWS
    assert records.shape[1] % config.chunk_size == 0, \
        "MAX_PAIRS must be a multiple of chunk_size (binning guarantees this)"
    assert group_starts.shape == (num_groups + 1,)
    tile_out = _fwd_pallas(records, group_starts, num_groups, config,
                           interpret)
    return tile_out, (records, group_starts, tile_out)


def _rasterize_fwd(records, group_starts, num_groups, config, interpret):
    return _rasterize_fwd_impl(records, group_starts, num_groups, config,
                               interpret)


def _rasterize_bwd(num_groups, config, interpret, res, g_tile):
    records, group_starts, tile_out = res
    drec = _bwd_pallas(records, group_starts, tile_out, g_tile, num_groups,
                       config, interpret)
    # lanes beyond the last group's range are never written by the kernel:
    # zero them (the gather transpose would otherwise scatter garbage).
    total = group_starts[-1]
    lane = jnp.arange(records.shape[1], dtype=jnp.int32)[None, :]
    drec = jnp.where(lane < total, drec, 0.0)
    return drec, None


rasterize_pairs.defvjp(_rasterize_fwd, _rasterize_bwd)


# ---------------------------------------------------------------------------
# High-level tiled renderer
# ---------------------------------------------------------------------------

def untile(tile_out, ntx: int, nty: int, ts: int, height: int, width: int):
    """(NG, C, GT, ts*ts) channel-major tile groups -> (H, W, C).

    A pure relayout, but a costly one: ~7 ms at treehill scale (16-wide
    inner dims defeat the (8, 128) vector tiling). The training/benchmark
    hot path avoids it entirely via image_to_tiles + tile-space losses;
    untile runs for display, export, and oracle comparison.
    """
    ng, c, gt, pix = tile_out.shape
    flat = tile_out.transpose(0, 2, 1, 3).reshape(ng * gt, c, pix)
    img = flat[:ntx * nty].reshape(nty, ntx, c, ts, ts)
    img = img.transpose(0, 3, 1, 4, 2).reshape(nty * ts, ntx * ts, c)
    return img[:height, :width]


def untile_chw(tile_out, ntx: int, nty: int, ts: int, height: int,
               width: int):
    """(NG, C, GT, ts*ts) tile groups -> (C, H, W), channel-MAJOR.

    Cheaper than ``untile`` on TPU (the minor dim stays W-sized instead of
    C-sized) and feeds ``train.loss.ssim_chw`` directly -- channel-major is
    what the depthwise SSIM blur needs anyway (see loss._blur_chw).
    """
    ng, c, gt, pix = tile_out.shape
    flat = tile_out.transpose(0, 2, 1, 3).reshape(ng * gt, c, pix)
    img = flat[:ntx * nty].reshape(nty, ntx, c, ts, ts)
    img = img.transpose(2, 0, 3, 1, 4).reshape(c, nty * ts, ntx * ts)
    return img[:, :height, :width]


def image_to_tiles(img: jax.Array, config: RasterizerConfig) -> jax.Array:
    """(H, W, C) -> (NG, C, GT, ts*ts), the rasterizer's native layout.

    Inverse of `untile` (up to zero padding). Training pre-tiles each target
    image ONCE so every step's photometric loss runs directly on the
    rasterizer output, skipping two ~200 MB relayouts per step (fwd + its
    transpose in bwd).
    """
    h, w, c = img.shape
    ts = config.tile_size
    gt = config.group_tiles
    ntx, nty = tile_grid(w, h, ts)
    ng = num_groups_for(ntx * nty, config)
    pad = jnp.pad(img, ((0, nty * ts - h), (0, ntx * ts - w), (0, 0)))
    tiles = pad.reshape(nty, ts, ntx, ts, c).transpose(0, 2, 4, 1, 3)
    tiles = tiles.reshape(nty * ntx, c, ts * ts)
    tiles = jnp.pad(tiles, ((0, ng * gt - nty * ntx), (0, 0), (0, 0)))
    return tiles.reshape(ng, gt, c, ts * ts).transpose(0, 2, 1, 3)


def tile_pixel_mask(height: int, width: int,
                    config: RasterizerConfig) -> jax.Array:
    """(NG, 1, GT, ts*ts) 0/1 mask of pixels inside the true image bounds."""
    ones = jnp.ones((height, width, 1), jnp.float32)
    return image_to_tiles(ones, config)


@functools.partial(
    jax.jit,
    static_argnames=("config", "active_sh_degree", "return_aux", "interpret"))
def render_tiles(
    model: GaussianModel,
    camera: Camera,
    config: RasterizerConfig = RasterizerConfig(),
    active_sh_degree: Optional[int] = None,
    return_aux: bool = False,
    interpret: Optional[bool] = None,
    mean2d_offset: Optional[jax.Array] = None,
):
    """Render in the rasterizer's native tile layout: (NG, 5, GT, ts*ts).

    Channels are [r, g, b, depth, alpha]. Differentiable; pair gradients
    scatter back through the binning gather exactly as in render_tiled.
    With ``return_aux=True`` also returns the binning/visibility aux dict
    (the training path consumes it without ever untiling).
    """
    if interpret is None:
        interpret = _interpret_default()
    h, w = camera.height, camera.width
    ntx, nty = tile_grid(w, h, config.tile_size)
    num_groups = num_groups_for(ntx * nty, config)
    proj = project_gaussians(model, camera, config, active_sh_degree,
                             mean2d_offset)
    bins = bin_gaussians(proj, w, h, config)
    tiles = rasterize_pairs(
        bins.pair_records, bins.group_starts, num_groups, config, interpret)
    if return_aux:
        aux = dict(
            overflowed=bins.overflowed,
            num_pairs=bins.num_pairs,
            visible=jax.lax.stop_gradient(proj.valid),
        )
        return tiles, aux
    return tiles


@functools.partial(
    jax.jit,
    static_argnames=("config", "active_sh_degree", "return_aux", "interpret"))
def render_tiled(
    model: GaussianModel,
    camera: Camera,
    config: RasterizerConfig = RasterizerConfig(),
    active_sh_degree: Optional[int] = None,
    return_aux: bool = False,
    interpret: Optional[bool] = None,
    mean2d_offset: Optional[jax.Array] = None,
):
    """Full pipeline: project -> bin -> Pallas rasterize -> (H, W, 3)."""
    if interpret is None:
        interpret = _interpret_default()
    h, w = camera.height, camera.width
    ts = config.tile_size
    ntx, nty = tile_grid(w, h, ts)
    num_groups = num_groups_for(ntx * nty, config)

    proj = project_gaussians(model, camera, config, active_sh_degree,
                             mean2d_offset)
    bins = bin_gaussians(proj, w, h, config)
    tile_out = rasterize_pairs(
        bins.pair_records, bins.group_starts, num_groups, config, interpret)
    # untile only the channels consumed: the relayout moves ~32 bytes/pixel,
    # a large share of the forward HBM traffic at treehill scale
    if not return_aux and not interpret:
        # hot render path: Pallas transpose-chain relayout + one (3,H,W) ->
        # (H,W,3) transpose -- 5.8 ms vs 18 ms for the XLA untile at
        # treehill scale (bit-identical; relayout gate + tests)
        from intro_to_gaussian_splatting_tpu.ops.relayout_pallas import (
            untile_chw_fast,
        )
        chw = untile_chw_fast(tile_out[:, :4], ntx, nty, ts, h, w, False)
        image = jnp.transpose(chw, (1, 2, 0))
    else:
        nchan = OUT_CHANNELS if return_aux else 3
        full = untile(tile_out[:, :nchan], ntx, nty, ts, h, w)
        image = full[..., :3]
    if config.compat.skip_last_tile:
        ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        lim_x = ((w - ts - 1) // ts + 1) * ts if w > ts else 0
        lim_y = ((h - ts - 1) // ts + 1) * ts if h > ts else 0
        mask = ((xs < lim_x) & (ys < lim_y)).astype(image.dtype)
        image = image * mask[..., None]
    if return_aux:
        alpha = full[..., 4]
        aux = dict(
            depth=full[..., 3],
            alpha=alpha,
            # API semantics: the accumulated-weight complement 1 - alpha,
            # NOT the kernel's exact exit transmittance. It differs from
            # the true final Π(1-αᵢ) by at most the excluded tail mass,
            # bounded by t_threshold / (1 - alpha_clamp) (see
            # render_dense(return_aux=True) for the exact oracle quantity;
            # test_aux_outputs checks the bound).
            transmittance=jax.lax.stop_gradient(1.0 - alpha),
            overflowed=bins.overflowed,
            num_pairs=bins.num_pairs,
            visible=jax.lax.stop_gradient(proj.valid),
        )
        return image, aux
    return image
