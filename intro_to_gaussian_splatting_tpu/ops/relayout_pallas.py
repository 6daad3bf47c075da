"""Pallas tile<->image relayout: (NG, C, GT, ts*ts) tiles <-> (C, H, W).

The training loss needs the rasterizer's native tile-group layout unpacked
into a channel-major image only for the SSIM term (L1/PSNR run tile-space,
see train/trainer.py). XLA lowers that unpack (`untile_chw`) to relayouts
whose intermediates carry a 16-wide minor dimension -- padded 8x against
the (8, 128) vector tiling -- measured 9-24 ms per call at treehill scale
(5068x3324) on v5e, by far the largest single cost in the train step
(scripts/step_breakdown.py). The reference has no analogue: its CPU path
writes pixels scalar-by-scalar (splat/gaussian_scene.py:227-237) and its
CUDA path is already pixel-major (render.cu:83-85).

The kernel expresses the per-tile-row merge (ntx, ts*ts) -> (ts, ntx*ts)
purely with TRANSPOSES and order-preserving reshapes -- the only relayout
primitives Mosaic lowers efficiently (data-moving reshapes between sublanes
and lanes are rejected/miscompiled by the current toolchain; probed
empirically):

    A (ntx, ts*ts)[t, y*ts+x] --T--> (ts*ts, ntx) --reshape-->
    (ts, ts, ntx)[y, x, t] --transpose(2,1,0)--> [t, x, y]
    --reshape (free)--> (ntx*ts, ts) --T--> (ts, ntx*ts)[y, t*ts+x]

Bands of R tile rows stream through double-buffered VMEM with manual DMAs
(the band start index R*ntx is not 8-aligned, so BlockSpec pipelining
cannot express it). The channel dimension must be 4-aligned for the HBM
DMA tiling, so the public API takes FOUR channels (rgb + the depth channel
the rasterizer emits anyway) and returns the RGB image; the adjoint gives
the depth channel an exactly-zero cotangent.

Measured v5e, treehill scale: forward ~3 ms, adjoint ~7 ms, vs 9.5 ms
XLA forward marginal inside the step (and ~24 ms standalone).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_R = 8           # tile rows per band (keeps the backward DMA 8-aligned)
_C = 4           # channel slots (DMA tiling needs a 4-aligned channel dim)


def _merge(a, n_t, t):
    """(n_t, t*t) [tile, y*t+x] -> (t, n_t*t) [y, tile*t+x]."""
    p = a.T.reshape(t, t, n_t).transpose(2, 1, 0)   # [tile, x, y]
    return p.reshape(n_t * t, t).T                  # (t, n_t*t)


def _split(b, n_t, t):
    """Adjoint/inverse of _merge: (t, n_t*t) -> (n_t, t*t)."""
    p = b.T.reshape(n_t, t, t).transpose(2, 1, 0)   # [y, x, tile]
    return p.reshape(t * t, n_t).T                  # (n_t, t*t)


def _untile_kernel(xp, out_ref, xv, sem, *, ntx, ts, wt, wp):
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    rows_in = _R * ntx

    def dma(band, slot):
        return pltpu.make_async_copy(
            xp.at[pl.ds(band * rows_in, rows_in)], xv.at[slot], sem.at[slot])

    slot = jax.lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        dma(i, slot).start()

    @pl.when(i + 1 < nb)
    def _():
        dma(i + 1, 1 - slot).start()
    dma(i, slot).wait()
    x = xv[slot]                                    # (R*ntx, C, ts*ts)
    # work in PADDED tile-column space (wp // ts columns): lane offsets stay
    # 128-aligned throughout; the pad/slice happens on sublanes (cheap)
    ntxp = wp // ts
    for c in range(_C):
        rows = [_merge(jnp.pad(x[r * ntx:(r + 1) * ntx, c, :],
                               ((0, ntxp - ntx), (0, 0))), ntxp, ts)
                for r in range(_R)]
        out_ref[c] = jnp.concatenate(rows, axis=0)


def _tile_kernel(gp, out_ref, gv, sem, *, ntx, ts, wt, wp):
    i = pl.program_id(0)
    nb = pl.num_programs(0)

    def dma(band, slot):
        return pltpu.make_async_copy(
            gp.at[:, pl.ds(band * _R * ts, _R * ts), :], gv.at[slot],
            sem.at[slot])

    slot = jax.lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        dma(i, slot).start()

    @pl.when(i + 1 < nb)
    def _():
        dma(i + 1, 1 - slot).start()
    dma(i, slot).wait()
    g = gv[slot]                                    # (C, R*ts, Wp)
    # split ENTIRELY in padded tile-column space (ntxp = wp/ts columns):
    # every op stays 8/128-aligned (odd-ntx sublane slices or stores fail
    # to lower compiled); the wrapper compacts the pad columns in XLA
    ntxp = wp // ts
    rows = []
    for r in range(_R):
        chans = [_split(g[c, r * ts:(r + 1) * ts, :], ntxp, ts)[:, None, :]
                 for c in range(_C)]
        rows.append(jnp.concatenate(chans, axis=1))
    out_ref[...] = jnp.concatenate(rows, axis=0)    # (R*ntxp, C, pix)


def _vmem_params():
    return pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                                vmem_limit_bytes=128 * 1024 * 1024)


def _untile_impl(tile4, ntx, nty, ts, height, width, interpret):
    ng, c, gt, pix = tile4.shape
    assert c == _C and pix == ts * ts
    wt = ntx * ts
    wp = ((wt + 127) // 128) * 128
    # group-major flatten; the transpose keeps the ts*ts minor intact
    flat = tile4.transpose(0, 2, 1, 3).reshape(ng * gt, _C, pix)
    nb = -(-nty // _R)
    need = nb * _R * ntx
    if need > flat.shape[0]:
        flat = jnp.pad(flat, ((0, need - flat.shape[0]), (0, 0), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_untile_kernel, ntx=ntx, ts=ts, wt=wt, wp=wp),
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((_C, _R * ts, wp), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_C, nb * _R * ts, wp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, _R * ntx, _C, pix), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
        compiler_params=_vmem_params(),
    )(flat)
    return out[:3, :height, :width]


def _tile_impl(g3, ng, gt, ntx, nty, ts, interpret):
    """(3, H, W) cotangent -> (NG, 4, GT, ts*ts); channel 3 exactly zero."""
    pix = ts * ts
    wt = ntx * ts
    wp = ((wt + 127) // 128) * 128
    nb = -(-nty // _R)
    hp = nb * _R * ts
    ntxp = wp // ts
    g = jnp.pad(g3, ((0, _C - 3), (0, hp - g3.shape[1]),
                     (0, wp - g3.shape[2])))
    out = pl.pallas_call(
        functools.partial(_tile_kernel, ntx=ntx, ts=ts, wt=wt, wp=wp),
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((_R * ntxp, _C, pix), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * _R * ntxp, _C, pix),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, _C, _R * ts, wp), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
        compiler_params=_vmem_params(),
    )(g)
    # compact the pad tile-columns (cotangents there are exactly zero --
    # the image was zero-padded to wp), then restore group-major layout.
    # The band padding may also overshoot NG*GT (small scenes) or
    # undershoot it (group padding beyond the last tile row).
    out = out.reshape(nb * _R, ntxp, _C, pix)[:, :ntx].reshape(
        nb * _R * ntx, _C, pix)
    nt_total = ng * gt
    out = out[:nt_total]
    if out.shape[0] < nt_total:
        out = jnp.pad(out, ((0, nt_total - out.shape[0]), (0, 0), (0, 0)))
    return out.reshape(ng, gt, _C, pix).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6))
def untile_chw_fast(tile4, ntx: int, nty: int, ts: int, height: int,
                    width: int, interpret: bool = False):
    """(NG, 4, GT, ts*ts) tile groups -> (3, H, W) channel-major image.

    Same permutation as ops.rasterize_pallas.untile_chw restricted to the
    first 3 channels (bit-identical; tested), via the Pallas kernel above.
    Channel 3 (depth) is along for DMA alignment and receives a zero
    cotangent. Differentiable; the VJP runs the exact adjoint kernel.
    """
    return _untile_impl(tile4, ntx, nty, ts, height, width, interpret)


def _untile_fwd(tile4, ntx, nty, ts, height, width, interpret):
    out = _untile_impl(tile4, ntx, nty, ts, height, width, interpret)
    return out, (tile4.shape[0], tile4.shape[2])


def _untile_bwd(ntx, nty, ts, height, width, interpret, res, g):
    ng, gt = res
    d = _tile_impl(g, ng, gt, ntx, nty, ts, interpret)
    return (d,)


untile_chw_fast.defvjp(_untile_fwd, _untile_bwd)
