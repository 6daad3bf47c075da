"""Pallas TPU rasterizer: tiled forward compositing + hand-derived backward.

TPU-native replacement for the reference CUDA kernel (splat/c/render.cu).
Differences are architectural, not cosmetic:

  * The CUDA kernel runs one thread per pixel, scanning ALL gaussians with a
    per-thread bbox reject and `break` (render.cu:49-81). Here the grid is one
    program per 16x16 tile; the tile's pre-binned, depth-ordered gaussian
    range (ops/binning.py) streams HBM->VMEM with double-buffered DMA.
  * Block layout is TRANSPOSED relative to the obvious port: gaussians live
    on SUBLANES (chunks of config.chunk_size, default 16) and the tile's 256
    pixels on LANES. The minimum per-tile work quantum is therefore a
    (16, 256) VPU block -- 16x smaller than a (256, 256) pixel-major chunk --
    which matters because at reference init scale most tiles hold only a
    couple of splats. Records are stored pair-major (MAX_PAIRS, 128) so a
    chunk DMAs as a dense (chunk, 128) row window (Mosaic requires lane
    windows be 128-aligned; sublane windows only 8-aligned).
  * Front-to-back compositing is a prefix product: log-transmittance prefix
    sums run as a log2(chunk)-step sublane shift-add scan, not a per-pixel
    loop ("break" becomes a lane-masked `include` test -- exact because T is
    monotone when alpha <= alpha_clamp < 1; see ops/compositing.py).
  * Early exit is per tile: the chunk loop is a while_loop that stops once
    every pixel's transmittance is below threshold.
  * The backward pass (absent in the reference -- nothing ever backprops
    through its renderer, SURVEY.md section 0) runs in FORWARD order: the
    suffix sums it needs come from `U_all - prefix` where `U_all` is
    recovered from the forward outputs, so no back-to-front sweep and no
    per-gaussian state is stored.

Per-pair gradients are written disjointly by the owning tile (plus a benign
8-row-aligned overhang that later tiles overwrite -- the TPU grid is
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
from intro_to_gaussian_splatting_tpu.ops.projection import project_gaussians

_LOG_FLOOR = -30.0
# Output channels per pixel: [r, g, b, depth, alpha, T_final, 0, 0]
OUT_CHANNELS = 8
OUT_T = 5
# Sublane alignment of DMA row windows (f32 tiling is (8, 128)).
_SUBALIGN = 8


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _tile_pixel_coords(t, ntx: int, ts: int):
    """Global pixel coords of tile t's pixels, row-major, as (1, PIX) f32."""
    pix = ts * ts
    l = jax.lax.broadcasted_iota(jnp.int32, (1, pix), 1)
    tx = t % ntx
    ty = t // ntx
    px = (tx * ts + l % ts).astype(jnp.float32)
    py = (ty * ts + l // ts).astype(jnp.float32)
    return px, py


def _sub_mask(i, shift, end, chunk: int):
    """(CHUNK, 1) validity for window row i*chunk+row in [shift, end)."""
    offs = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0) + i * chunk
    return ((offs >= shift) & (offs < end)).astype(jnp.float32)


def scan_sublanes_incl(x: jax.Array) -> jax.Array:
    """Inclusive prefix sum along sublanes (axis 0), log-step shift-add."""
    g = x.shape[0]
    k = 1
    while k < g:
        pad = jnp.zeros((k,) + x.shape[1:], x.dtype)
        x = x + jnp.concatenate([pad, x[:-k]], axis=0)
        k *= 2
    return x


def _col(rec, c):
    """Feature column c of the (G, 128) record block as (G, 1)."""
    return rec[:, c:c + 1]


def _alpha_terms(rec, px, py, gmask, config: RasterizerConfig):
    """Shared fwd/bwd per-chunk alpha evaluation in transposed layout.

    rec: (G, 128) records; px, py: (1, PIX); gmask: (G, 1).
    Returns (dx, dy, weight, alpha_raw, a) all (G, PIX)-shaped (or bcastable).
    Semantics identical to ops/compositing.py:gaussian_alpha/effective_alpha
    (ref utils.py:357-365, gaussian_scene.py:164, render.cu:55-71).
    """
    dx = px - _col(rec, P.REC_MEAN_X)
    dy = py - _col(rec, P.REC_MEAN_Y)
    q = (_col(rec, P.REC_CONIC_A) * dx * dx
         + 2.0 * _col(rec, P.REC_CONIC_B) * dx * dy
         + _col(rec, P.REC_CONIC_C) * dy * dy)
    weight = jnp.exp(-0.5 * q)
    alpha_raw = _col(rec, P.REC_OPACITY) * weight
    a = jnp.clip(alpha_raw, 0.0, config.alpha_clamp)
    if config.alpha_min > 0.0:
        a = jnp.where(alpha_raw >= config.alpha_min, a, 0.0)
    if config.compat.pixel_bbox_test:
        # CUDA path rejects pixels outside the gaussian's own bbox
        # (render.cu:55-60); bbox tests are inclusive on both ends.
        inb = ((px >= _col(rec, P.REC_MIN_X))
               & (px <= _col(rec, P.REC_MAX_X))
               & (py >= _col(rec, P.REC_MIN_Y))
               & (py <= _col(rec, P.REC_MAX_Y)))
        a = jnp.where(inb, a, 0.0)
    a = a * gmask
    return dx, dy, weight, alpha_raw, a


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(starts_ref, counts_ref, rec_hbm, out_ref, rec_vmem, sem,
                *, ntx: int, config: RasterizerConfig):
    ts = config.tile_size
    chunk = config.chunk_size
    pix = ts * ts
    t = pl.program_id(0)
    start = starts_ref[t]
    astart = (start // _SUBALIGN) * _SUBALIGN
    shift = start - astart
    end = shift + counts_ref[t]          # window length incl. leading overlap
    # empty tiles do NO chunk work (shift > 0 alone must not force a chunk)
    nchunks = jnp.where(counts_ref[t] == 0, 0, pl.cdiv(end, chunk))
    px, py = _tile_pixel_coords(t, ntx, ts)

    def chunk_dma(i):
        slot = i % 2
        return pltpu.make_async_copy(
            rec_hbm.at[pl.ds(astart + i * chunk, chunk), :],
            rec_vmem.at[slot], sem.at[slot])

    def cond(state):
        i, T_carry, acc = state
        return jnp.logical_and(
            i < nchunks, jnp.max(T_carry) >= config.t_threshold)

    def body(state):
        # invariant: DMA for chunk i is in flight on entry (slot i % 2)
        i, T_carry, acc = state

        @pl.when(i + 1 < nchunks)
        def _():
            chunk_dma(i + 1).start()
        chunk_dma(i).wait()
        rec = rec_vmem[i % 2]
        gmask = _sub_mask(i, shift, end, chunk)
        _, _, _, _, a = _alpha_terms(rec, px, py, gmask, config)
        s = jnp.maximum(jnp.log1p(-a), _LOG_FLOOR)
        s_incl = scan_sublanes_incl(s)
        T = T_carry * jnp.exp(s_incl - s)                       # (G, PIX)
        include = (T * (1.0 - a) >= config.t_threshold).astype(jnp.float32)
        w = T * a * include
        # accumulate the 5 payload channels [r, g, b, depth, alpha]
        new_rows = [
            acc[c - P.PAYLOAD_START:c - P.PAYLOAD_START + 1, :]
            + jnp.sum(w * _col(rec, c), axis=0, keepdims=True)
            for c in range(P.PAYLOAD_START, P.PAYLOAD_START + P.NUM_PAYLOAD)
        ]
        T_next = T_carry * jnp.exp(s_incl[chunk - 1:chunk, :])
        return i + 1, T_next, jnp.concatenate(new_rows, axis=0)

    @pl.when(nchunks > 0)
    def _():
        chunk_dma(0).start()

    T0 = jnp.ones((1, pix), jnp.float32)
    acc0 = jnp.zeros((P.NUM_PAYLOAD, pix), jnp.float32)
    i_fin, T_fin, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), T0, acc0))

    # transmittance early exit leaves the prefetched chunk i_fin in flight;
    # drain it so the persistent semaphore is clean for the next grid step
    @pl.when(jnp.logical_and(i_fin > 0, i_fin < nchunks))
    def _():
        chunk_dma(i_fin).wait()

    # channel-major (C, PIX): lanes = pixels, so the (NT, C, PIX) HBM buffer
    # needs no lane padding (a (NT, PIX, 8) layout costs 16x HBM padding)
    out_ref[0] = jnp.concatenate(
        [acc, T_fin,
         jnp.zeros((OUT_CHANNELS - P.NUM_PAYLOAD - 1, pix), jnp.float32)],
        axis=0)


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
                pltpu.VMEM((2, config.chunk_size, P.REC_LANES), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
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
    start = starts_ref[t]
    astart = (start // _SUBALIGN) * _SUBALIGN
    shift = start - astart
    end = shift + counts_ref[t]
    nchunks = jnp.where(counts_ref[t] == 0, 0, pl.cdiv(end, chunk))
    px, py = _tile_pixel_coords(t, ntx, ts)

    g5 = g_tile_ref[0, 0:P.NUM_PAYLOAD, :]           # (5, PIX) payload cotangent
    out5 = out_tile_ref[0, 0:P.NUM_PAYLOAD, :]       # (5, PIX) forward outputs
    # U_all[p] = sum_j gc[p,j] * W[p,j] over ALL gaussians of this tile
    #          = sum_k g5[k,p] * out5[k,p]  (because out5 = payload @ W)
    u_all = jnp.sum(g5 * out5, axis=0, keepdims=True)  # (1, PIX)

    def in_dma(i):
        slot = i % 2
        return pltpu.make_async_copy(
            rec_hbm.at[pl.ds(astart + i * chunk, chunk), :],
            rec_vmem.at[slot], sem_in.at[slot])

    def body(i, state):
        # invariant: input DMA for chunk i is in flight on entry (slot i % 2)
        T_carry, u_done = state
        off = astart + i * chunk

        @pl.when(i + 1 < nchunks)
        def _():
            in_dma(i + 1).start()
        # while the records stream in, fetch the previous tile's gradients
        # already present in the first (8-row-aligned, overlapping) window
        merge_dma = pltpu.make_async_copy(
            drec_hbm.at[pl.ds(off, chunk), :], drec_vmem, sem_out)

        @pl.when(i == 0)
        def _():
            merge_dma.start()
        in_dma(i).wait()

        @pl.when(i == 0)
        def _():
            merge_dma.wait()
        rec = rec_vmem[i % 2]
        gmask = _sub_mask(i, shift, end, chunk)
        dx, dy, weight, alpha_raw, a = _alpha_terms(rec, px, py, gmask, config)
        op = _col(rec, P.REC_OPACITY)
        ca = _col(rec, P.REC_CONIC_A)
        cb = _col(rec, P.REC_CONIC_B)
        cc = _col(rec, P.REC_CONIC_C)
        s = jnp.maximum(jnp.log1p(-a), _LOG_FLOOR)
        s_incl = scan_sublanes_incl(s)
        T = T_carry * jnp.exp(s_incl - s)                           # (G, PIX)
        include = (T * (1.0 - a) >= config.t_threshold).astype(jnp.float32)
        W = T * a * include

        # gc[g, p] = sum_c g5[c, p] * payload[g, c]
        gc = sum(_col(rec, c) * g5[c - P.PAYLOAD_START:c - P.PAYLOAD_START + 1, :]
                 for c in range(P.PAYLOAD_START, P.PAYLOAD_START + P.NUM_PAYLOAD))
        u = gc * W
        prefix_incl = scan_sublanes_incl(u)
        suffix = u_all - u_done - prefix_incl
        da = gc * T * include - suffix / (1.0 - a)

        # chain rule a = clip(alpha_raw, 0, clamp) * masks
        passthrough = ((a > 0.0) & (alpha_raw < config.alpha_clamp)
                       ).astype(jnp.float32)
        dalpha = da * passthrough                                    # (G, PIX)

        dop = jnp.sum(dalpha * weight, axis=1, keepdims=True)        # (G, 1)
        dq = dalpha * op * weight * (-0.5)                           # dL/d(power)
        dca = jnp.sum(dq * dx * dx, axis=1, keepdims=True)
        dcb = jnp.sum(dq * 2.0 * dx * dy, axis=1, keepdims=True)
        dcc = jnp.sum(dq * dy * dy, axis=1, keepdims=True)
        dmx = jnp.sum(dq * (-(2.0 * ca * dx + 2.0 * cb * dy)),
                      axis=1, keepdims=True)
        dmy = jnp.sum(dq * (-(2.0 * cc * dy + 2.0 * cb * dx)),
                      axis=1, keepdims=True)
        # dpayload[g, c] = sum_p W[g, p] * g5[c, p]   (4 rows: rgb + depth;
        # the "one" payload row is constant)
        dpay = [jnp.sum(W * g5[c:c + 1, :], axis=1, keepdims=True)
                for c in range(4)]

        d_chunk = jnp.concatenate(
            [dmx, dmy, dca, dcb, dcc, dop,
             jnp.zeros((chunk, 5), jnp.float32)]     # rows 6..10 (bbox+spare)
            + dpay
            + [jnp.zeros((chunk, P.REC_LANES - 15), jnp.float32)],
            axis=1)
        # First chunk: rows before `shift` hold the previous tile's already-
        # written gradients (the aligned window overlaps its range) -- keep
        # them. The grid is sequential, so the previous tile has finished.
        row = jax.lax.broadcasted_iota(jnp.int32, (chunk, P.REC_LANES), 0)
        keep_prev = jnp.logical_and(i == 0, row < shift)
        drec_vmem[:, :] = jnp.where(keep_prev, drec_vmem[:, :], d_chunk)
        out_dma = pltpu.make_async_copy(
            drec_vmem, drec_hbm.at[pl.ds(off, chunk), :], sem_out)
        out_dma.start()
        out_dma.wait()

        T_next = T_carry * jnp.exp(s_incl[chunk - 1:chunk, :])
        u_next = u_done + prefix_incl[chunk - 1:chunk, :]
        return T_next, u_next

    @pl.when(nchunks > 0)
    def _():
        in_dma(0).start()

    T0 = jnp.ones((1, pix), jnp.float32)
    U0 = jnp.zeros((1, pix), jnp.float32)
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
                pltpu.VMEM((2, config.chunk_size, P.REC_LANES), jnp.float32),
                pltpu.VMEM((config.chunk_size, P.REC_LANES), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
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
    """records (MP, REC_LANES) -> tile_out (NT, OUT_CHANNELS, ts*ts).

    MP must be a multiple of config.chunk_size; one extra zero chunk is
    appended internally so the last chunk's DMA never reads out of bounds.
    """
    tile_out, _ = _rasterize_fwd_impl(records, starts, counts, num_tiles,
                                      ntx, config, interpret)
    return tile_out


def _pad_records(records, chunk: int):
    return jnp.pad(records, ((0, chunk), (0, 0)))


def _rasterize_fwd_impl(records, starts, counts, num_tiles, ntx, config,
                        interpret):
    assert records.shape[0] % config.chunk_size == 0, \
        "MAX_PAIRS must be a multiple of chunk_size (binning guarantees this)"
    assert records.shape[1] == P.REC_LANES
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
    drec = drec[:records.shape[0], :]
    # pairs beyond every tile's range are never written by the kernel: zero
    # them (the gather transpose would otherwise scatter garbage).
    total = counts.sum()
    pair_pos = jnp.arange(records.shape[0], dtype=jnp.int32)[:, None]
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
