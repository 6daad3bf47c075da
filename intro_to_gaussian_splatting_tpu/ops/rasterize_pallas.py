"""Pallas TPU rasterizer: tiled forward compositing + hand-derived backward.

TPU-native replacement for the reference CUDA kernel (splat/c/render.cu).
Differences are architectural, not cosmetic:

  * The CUDA kernel runs one thread per pixel, scanning ALL gaussians with a
    per-thread bbox reject and `break` (render.cu:49-81). Here the grid is one
    program per 16x16 tile; the tile's pre-binned, depth-ordered gaussian
    range (ops/binning.py) streams HBM->VMEM in chunks, and compositing runs
    as triangular-matmul prefix products on the MXU over the whole
    (pixels x chunk) block at once (see ops/compositing.py).
  * Early exit is per tile, not per pixel: the chunk loop is a while_loop
    that stops once every pixel's transmittance is below threshold.
  * The backward pass (absent in the reference -- nothing ever backprops
    through its renderer, SURVEY.md section 0) runs in FORWARD order: the
    suffix sums it needs come from `U_all - prefix` where `U_all` is
    recovered from the forward outputs, so no back-to-front sweep and no
    per-gaussian state is stored.

Per-pair gradients are written disjointly by the owning tile (plus a benign
chunk-aligned overhang that the next grid step overwrites -- the TPU grid is
sequential by construction), then scatter-added to gaussian slots by the
autodiff transpose of the binning gather.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from intro_to_gaussian_splatting_tpu.config import RasterizerConfig
from intro_to_gaussian_splatting_tpu.models.camera import Camera
from intro_to_gaussian_splatting_tpu.models.gaussians import GaussianModel
from intro_to_gaussian_splatting_tpu.ops import projection as P
from intro_to_gaussian_splatting_tpu.ops.binning import bin_gaussians, tile_grid
from intro_to_gaussian_splatting_tpu.ops.compositing import (
    CompositeCarry,
    composite_chunk,
    effective_alpha,
    incl_lower_triangle,
    strict_lower_triangle,
    _row,
)
from intro_to_gaussian_splatting_tpu.ops.projection import project_gaussians

_HI = jax.lax.Precision.HIGHEST
# Output channels per pixel: [r, g, b, depth, alpha, T_final, 0, 0]
OUT_CHANNELS = 8
OUT_T = 5


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _tile_pixel_coords(t, ntx: int, ts: int):
    """Global pixel coords of tile t's pixels, row-major, as (PIX, 1) f32."""
    pix = ts * ts
    l = jax.lax.broadcasted_iota(jnp.int32, (pix, 1), 0)
    tx = t % ntx
    ty = t // ntx
    px = (tx * ts + l % ts).astype(jnp.float32)
    py = (ty * ts + l // ts).astype(jnp.float32)
    return px, py


def _align_of(chunk: int) -> int:
    """DMA lane-slice alignment. Mosaic requires lane offsets divisible by
    the 128-lane tiling; tile pair ranges start at arbitrary offsets, so each
    tile's chunk window is aligned DOWN to 128 and the leading overlap into
    the previous tile's range is masked out (<= 1 extra chunk of work)."""
    return 128 if chunk % 128 == 0 else chunk


def _chunk_mask(i, shift, end, chunk: int):
    """(1, CHUNK) validity for window position i*chunk+lane in [shift, end)."""
    offs = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1) + i * chunk
    return (offs >= shift) & (offs < end)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(starts_ref, counts_ref, rec_hbm, out_ref, rec_vmem, sem,
                *, ntx: int, config: RasterizerConfig):
    ts = config.tile_size
    chunk = config.chunk_size
    pix = ts * ts
    t = pl.program_id(0)
    align = _align_of(chunk)
    start = starts_ref[t]
    astart = (start // align) * align
    shift = start - astart
    end = shift + counts_ref[t]          # window length incl. leading overlap
    nchunks = pl.cdiv(end, chunk)
    px, py = _tile_pixel_coords(t, ntx, ts)

    def cond(state):
        i, carry = state
        return jnp.logical_and(
            i < nchunks,
            jnp.max(carry.transmittance) >= config.t_threshold)

    def body(state):
        i, carry = state
        off = pl.multiple_of(astart + i * chunk, align)
        dma = pltpu.make_async_copy(
            rec_hbm.at[:, pl.ds(off, chunk)], rec_vmem, sem)
        dma.start()
        dma.wait()
        gmask = _chunk_mask(i, shift, end, chunk)
        carry = composite_chunk(carry, px, py, rec_vmem[:, :], gmask, config)
        return i + 1, carry

    carry0 = CompositeCarry(
        transmittance=jnp.ones((pix, 1), jnp.float32),
        accum=jnp.zeros((pix, P.NUM_PAYLOAD), jnp.float32),
        alive=jnp.ones((pix, 1), jnp.float32),
    )
    _, carry = jax.lax.while_loop(cond, body, (jnp.int32(0), carry0))
    out = jnp.concatenate(
        [carry.accum, carry.transmittance,
         jnp.zeros((pix, OUT_CHANNELS - P.NUM_PAYLOAD - 1), jnp.float32)],
        axis=1)
    # channel-major (C, PIX): lanes = pixels, so the (NT, C, PIX) HBM buffer
    # needs no lane padding (a (NT, PIX, 8) layout costs 16x HBM padding)
    out_ref[0] = out.T


def _fwd_pallas(records_padded, starts, counts, num_tiles: int, ntx: int,
                config: RasterizerConfig, interpret: bool):
    ts = config.tile_size
    pix = ts * ts
    kernel = functools.partial(_fwd_kernel, ntx=ntx, config=config)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(
                (1, OUT_CHANNELS, pix), lambda t, s, c: (t, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((P.NUM_REC_ROWS, config.chunk_size), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (num_tiles, OUT_CHANNELS, pix), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(starts, counts, records_padded)


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(starts_ref, counts_ref, rec_hbm, out_tile_ref, g_tile_ref,
                drec_hbm, rec_vmem, drec_vmem, sem_in, sem_out,
                *, ntx: int, config: RasterizerConfig):
    ts = config.tile_size
    chunk = config.chunk_size
    pix = ts * ts
    t = pl.program_id(0)
    align = _align_of(chunk)
    start = starts_ref[t]
    astart = (start // align) * align
    shift = start - astart
    end = shift + counts_ref[t]
    nchunks = pl.cdiv(end, chunk)
    px, py = _tile_pixel_coords(t, ntx, ts)

    g5 = g_tile_ref[0, 0:P.NUM_PAYLOAD, :].T         # (PIX, 5) payload cotangent
    out5 = out_tile_ref[0, 0:P.NUM_PAYLOAD, :].T     # (PIX, 5) forward outputs
    # U_all[p] = sum_j gc[p,j] * W[p,j] over ALL gaussians of this tile
    #          = sum_k g5[p,k] * out5[p,k]  (because out5 = W @ payload^T)
    u_all = jnp.sum(g5 * out5, axis=1, keepdims=True)  # (PIX, 1)

    def body(i, state):
        T_carry, u_done = state
        off = pl.multiple_of(astart + i * chunk, align)
        dma = pltpu.make_async_copy(
            rec_hbm.at[:, pl.ds(off, chunk)], rec_vmem, sem_in)
        dma.start()
        # while the records stream in, fetch the previous tile's gradients
        # already present in the first (overlapping) chunk window
        merge_dma = pltpu.make_async_copy(
            drec_hbm.at[:, pl.ds(off, chunk)], drec_vmem, sem_out)

        @pl.when(i == 0)
        def _():
            merge_dma.start()
        dma.wait()

        @pl.when(i == 0)
        def _():
            merge_dma.wait()
        rec = rec_vmem[:, :]
        gmask = _chunk_mask(i, shift, end, chunk)

        op = _row(rec, P.REC_OPACITY)
        dx = px - _row(rec, P.REC_MEAN_X)
        dy = py - _row(rec, P.REC_MEAN_Y)
        ca = _row(rec, P.REC_CONIC_A)
        cb = _row(rec, P.REC_CONIC_B)
        cc = _row(rec, P.REC_CONIC_C)
        q = ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy
        weight = jnp.exp(-0.5 * q)
        alpha_raw = op * weight
        a = effective_alpha(alpha_raw, px, py, rec, gmask, config)
        s = jnp.maximum(jnp.log1p(-a), -30.0)
        s_excl = jax.lax.dot_general(
            s, strict_lower_triangle(chunk, jnp.float32),
            (((1,), (0,)), ((), ())),
            precision=_HI, preferred_element_type=jnp.float32)
        T = T_carry * jnp.exp(s_excl)                               # (PIX, G)
        include = (T * (1.0 - a) >= config.t_threshold).astype(jnp.float32)
        W = T * a * include

        payload = rec[P.PAYLOAD_START:, :]                          # (5, G)
        gc = jax.lax.dot_general(                                   # (PIX, G)
            g5, payload, (((1,), (0,)), ((), ())),
            precision=_HI, preferred_element_type=jnp.float32)
        u = gc * W
        prefix_incl = jax.lax.dot_general(
            u, incl_lower_triangle(chunk, jnp.float32),
            (((1,), (0,)), ((), ())),
            precision=_HI, preferred_element_type=jnp.float32)
        suffix = u_all - u_done - prefix_incl
        da = gc * T * include - suffix / (1.0 - a)

        # chain rule a = clip(alpha_raw, 0, clamp) * masks
        passthrough = ((a > 0.0) & (alpha_raw < config.alpha_clamp)
                       ).astype(jnp.float32)
        dalpha = da * passthrough                                    # (PIX, G)

        dop = jnp.sum(dalpha * weight, axis=0, keepdims=True)        # (1, G)
        dq = dalpha * op * weight * (-0.5)                           # dL/d(power)
        dca = jnp.sum(dq * dx * dx, axis=0, keepdims=True)
        dcb = jnp.sum(dq * 2.0 * dx * dy, axis=0, keepdims=True)
        dcc = jnp.sum(dq * dy * dy, axis=0, keepdims=True)
        dmx = jnp.sum(dq * (-(2.0 * ca * dx + 2.0 * cb * dy)),
                      axis=0, keepdims=True)
        dmy = jnp.sum(dq * (-(2.0 * cc * dy + 2.0 * cb * dx)),
                      axis=0, keepdims=True)
        dpayload = jax.lax.dot_general(                               # (5, G)
            g5, W, (((0,), (0,)), ((), ())),
            precision=_HI, preferred_element_type=jnp.float32)

        zeros5 = jnp.zeros((5, chunk), jnp.float32)
        d_chunk = jnp.concatenate([
            dmx, dmy, dca, dcb, dcc, dop,
            zeros5,                              # rows 6..10 (bbox + spare)
            dpayload[0:4, :],                    # rows 11..14 (rgb + depth)
            jnp.zeros((1, chunk), jnp.float32),  # row 15 ("one" is constant)
        ], axis=0)
        # First chunk: lanes before `shift` hold the previous tile's already-
        # written gradients (the aligned window overlaps its range) -- keep
        # them. The grid is sequential, so the previous tile has finished.
        lane = jax.lax.broadcasted_iota(jnp.int32, (P.NUM_REC_ROWS, chunk), 1)
        keep_prev = jnp.logical_and(i == 0, lane < shift)
        drec_vmem[:, :] = jnp.where(keep_prev, drec_vmem[:, :], d_chunk)
        out_dma = pltpu.make_async_copy(
            drec_vmem, drec_hbm.at[:, pl.ds(off, chunk)], sem_out)
        out_dma.start()
        out_dma.wait()

        T_next = T_carry * jnp.exp(s_excl[:, -1:] + s[:, -1:])
        u_next = u_done + prefix_incl[:, -1:]
        return T_next, u_next

    T0 = jnp.ones((pix, 1), jnp.float32)
    U0 = jnp.zeros((pix, 1), jnp.float32)
    jax.lax.fori_loop(0, nchunks, body, (T0, U0))


def _bwd_pallas(records_padded, starts, counts, tile_out, g_tile,
                num_tiles: int, ntx: int, config: RasterizerConfig,
                interpret: bool):
    ts = config.tile_size
    pix = ts * ts
    kernel = functools.partial(_bwd_kernel, ntx=ntx, config=config)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec((1, OUT_CHANNELS, pix), lambda t, s, c: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, OUT_CHANNELS, pix), lambda t, s, c: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[
                pltpu.VMEM((P.NUM_REC_ROWS, config.chunk_size), jnp.float32),
                pltpu.VMEM((P.NUM_REC_ROWS, config.chunk_size), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(records_padded.shape, jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True),
    )(starts, counts, records_padded, tile_out, g_tile)


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def rasterize_pairs(records, starts, counts, num_tiles: int, ntx: int,
                    config: RasterizerConfig, interpret: bool):
    """records (NUM_REC_ROWS, MP) -> tile_out (NT, ts*ts, OUT_CHANNELS).

    MP must be a multiple of config.chunk_size; one extra zero chunk is
    appended internally so the last chunk's DMA never reads out of bounds.
    """
    tile_out, _ = _rasterize_fwd_impl(records, starts, counts, num_tiles,
                                      ntx, config, interpret)
    return tile_out


def _pad_records(records, chunk: int):
    return jnp.pad(records, ((0, 0), (0, chunk)))


def _rasterize_fwd_impl(records, starts, counts, num_tiles, ntx, config,
                        interpret):
    assert records.shape[1] % config.chunk_size == 0, \
        "MAX_PAIRS must be a multiple of chunk_size (binning guarantees this)"
    rp = _pad_records(records, config.chunk_size)
    tile_out = _fwd_pallas(rp, starts, counts, num_tiles, ntx, config,
                           interpret)
    return tile_out, (records, starts, counts, tile_out)


def _rasterize_fwd(records, starts, counts, num_tiles, ntx, config, interpret):
    tile_out, res = _rasterize_fwd_impl(records, starts, counts, num_tiles,
                                        ntx, config, interpret)
    return tile_out, res


def _rasterize_bwd(num_tiles, ntx, config, interpret, res, g_tile):
    records, starts, counts, tile_out = res
    rp = _pad_records(records, config.chunk_size)
    drec = _bwd_pallas(rp, starts, counts, tile_out, g_tile, num_tiles, ntx,
                       config, interpret)
    drec = drec[:, :records.shape[1]]
    # pairs beyond every tile's range are never written by the kernel: zero
    # them (the gather transpose would otherwise scatter garbage).
    total = counts.sum()
    pair_pos = jnp.arange(records.shape[1], dtype=jnp.int32)[None, :]
    drec = jnp.where(pair_pos < total, drec, 0.0)
    return drec, None, None


rasterize_pairs.defvjp(_rasterize_fwd, _rasterize_bwd)


# ---------------------------------------------------------------------------
# High-level tiled renderer
# ---------------------------------------------------------------------------

def untile(tile_out, ntx: int, nty: int, ts: int, height: int, width: int):
    """(NT, C, ts*ts) channel-major tiles -> (H, W, C)."""
    c = tile_out.shape[1]
    img = tile_out.reshape(nty, ntx, c, ts, ts)
    img = img.transpose(0, 3, 1, 4, 2).reshape(nty * ts, ntx * ts, c)
    return img[:height, :width]


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

    proj = project_gaussians(model, camera, config, active_sh_degree,
                             mean2d_offset)
    bins = bin_gaussians(proj, w, h, config)
    tile_out = rasterize_pairs(
        bins.pair_records, bins.tile_starts, bins.tile_counts,
        ntx * nty, ntx, config, interpret)
    full = untile(tile_out, ntx, nty, ts, h, w)
    image = full[..., :3]
    if config.compat.skip_last_tile:
        ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        lim_x = ((w - ts - 1) // ts + 1) * ts if w > ts else 0
        lim_y = ((h - ts - 1) // ts + 1) * ts if h > ts else 0
        mask = ((xs < lim_x) & (ys < lim_y)).astype(image.dtype)
        image = image * mask[..., None]
    if return_aux:
        aux = dict(
            depth=full[..., 3],
            alpha=full[..., 4],
            transmittance=jax.lax.stop_gradient(full[..., OUT_T]),
            overflowed=bins.overflowed,
            num_pairs=bins.num_pairs,
            visible=jax.lax.stop_gradient(proj.valid),
        )
        return image, aux
    return image
