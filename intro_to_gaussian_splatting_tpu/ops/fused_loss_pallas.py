"""Fused tile-space photometric loss: L1 + SSIM value AND pixel gradient
in ONE Pallas band pass that reads and writes the rasterizer's tile layout.

The reference has no loss at all (SURVEY.md section 0: every render runs
under no_grad); the 3DGS objective this framework trains,
(1-w)*L1 + w*(1-SSIM), previously cost four device passes per step at
treehill scale (measured v5e, PERF.md): untile relayout (~6 ms) + SSIM
forward (~6 ms) + SSIM backward with recomputed moments (~13 ms) + untile
adjoint (~7 ms). But training ALWAYS takes the gradient, the blur operator
is self-adjoint, and the tile->image permutation is cheap VMEM transpose
work -- so one kernel can do everything:

  * DMA a band of the PREDICTION in the rasterizer's own (C, tile, pix)
    flattened layout and merge it to image rows in VMEM with the
    transpose-chain relayout of ops/relayout_pallas (Mosaic lowers 2D/3D
    transposes + order-preserving reshapes well; the band's 6 tile rows
    cover the 64 output rows plus the 16-row SSIM halo on each side);
  * DMA the matching band of the (pre-padded, channel-major) TARGET image;
  * form the five 11x11-blurred moment fields, accumulate the band's SSIM
    value, L1 and MSE partial sums, and evaluate the SSIM pixel gradient
    via the adjoint blur of the window coefficients (one extra blur chain
    set -- the moments are already in registers);
  * fold in the L1 subgradient and the static loss weights, split the
    combined pixel gradient back to tile layout, and write it out.

HBM traffic per step: read prediction + target once, write the tile-space
gradient once. The tile->image->tile round trip never touches HBM, the
forward SSIM pass disappears (value rides the gradient pass), and the
backward of the whole photometric loss is a single scalar-scaled read of
the precomputed gradient stream.

Layout contract: the flattened prediction is channel-planar
(3, T*NTXP, pix) where NTXP is the tile-column count rounded up to 8 (so
every whole-tile-row HBM DMA offset is 8-aligned), row r*NTXP+c holds tile
(row r-1, col c) of the image (one zero tile row of top padding), and T
covers every band's halo. ``flatten_tiles``/``unflatten_grad`` convert
from/to the rasterizer's (NG, C, GT, pix) group layout in XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from intro_to_gaussian_splatting_tpu.ops.relayout_pallas import _merge, _split
from intro_to_gaussian_splatting_tpu.ops.ssim_pallas import (
    _HALO, _hblur, _interp_default, _kern, _moments, _ssim_terms, _vblur,
)

import os

# Output pixel rows per band. Mosaic's compile time grows SUPERLINEARLY
# with per-program work at large widths (measured at treehill width 5068:
# BR=32 compiles in ~7 min, BR=64 exceeded 40 min); 32 keeps the one-time
# compile tractable at a modest runtime cost (halo recompute fraction
# 54/32 vs 86/64 rows). Raise via env on toolchains with faster Mosaic.
_BR = int(os.environ.get("GSTPU_FUSED_BR", "32"))
_TOP = 16         # halo rows above/below (= 1 tile row; >= _HALO)
_TRO = _BR // 16  # output tile rows per band
_TRI = _TRO + 2   # input tile rows per band (1 halo row each side)


def _layout(ntx: int, nty: int, ts: int, h: int, w: int):
    assert ts == 16, "fused loss kernel assumes 16px tiles (config default)"
    assert h > _HALO and w > _HALO, "image smaller than the SSIM window"
    assert _BR % ts == 0 and _BR >= ts
    ntxp = ((ntx + 7) // 8) * 8      # 8-aligned tile-row stride
    nb = -(-h // _BR)                # pixel bands
    t_rows = _TRO * nb + 2           # 1 top pad + out rows + bottom halo
    wp = ntxp * ts                   # merged row width (multiple of 128)
    ht = _BR * nb + 2 * _TOP         # padded target height
    return ntxp, nb, t_rows, wp, ht


def flatten_tiles(tiles3: jax.Array, ntx: int, nty: int, ts: int,
                  nb: int, ntxp: int) -> jax.Array:
    """(NG, 3, GT, pix) group layout -> (3, T*NTXP, pix) planar-flat."""
    ng, c, gt, pix = tiles3.shape
    f = tiles3.transpose(1, 0, 2, 3).reshape(c, ng * gt, pix)[:, :nty * ntx]
    f = f.reshape(c, nty, ntx, pix)
    t_rows = _TRO * nb + 2
    f = jnp.pad(f, ((0, 0), (1, t_rows - 1 - nty), (0, ntxp - ntx), (0, 0)))
    return f.reshape(c, t_rows * ntxp, pix)


def unflatten_grad(dflat: jax.Array, ng: int, gt: int, ntx: int, nty: int,
                   nb: int, ntxp: int) -> jax.Array:
    """Adjoint of ``flatten_tiles`` for the kernel's (3, TRO*nb*NTXP, pix)
    gradient stream (which carries no top-pad row)."""
    c, _, pix = dflat.shape
    d = dflat.reshape(c, _TRO * nb, ntxp, pix)[:, :nty, :ntx]
    d = d.reshape(c, nty * ntx, pix)
    d = jnp.pad(d, ((0, 0), (0, ng * gt - nty * ntx), (0, 0)))
    return d.reshape(c, ng, gt, pix).transpose(1, 0, 2, 3)


def pad_target_chw(target: jax.Array, ntx: int, nty: int, ts: int,
                   h: int, w: int) -> jax.Array:
    """(H, W, 3) ground truth -> (3, HT, WP) padded channel-major layout
    the kernel DMAs bands from (16 zero rows on top for 8-aligned halo
    reads). Precompute once per camera; this replaces BOTH the pre-tiled
    target and the channel-major target image of the split path."""
    ntxp, nb, _, wp, ht = _layout(ntx, nty, ts, h, w)
    chw = jnp.transpose(target.astype(jnp.float32), (2, 0, 1))
    return jnp.pad(chw, ((0, 0), (_TOP, ht - h - _TOP), (0, wp - w)))


def _loss_kernel(pred_hbm, targ_hbm, dflat_ref, sums_ref, pv, tv, sem, *,
                 ntxp, ts, h, w, wp, c1, c2, kern, s_l1, s_ssim, nb):
    j = pl.program_id(0)
    rows_t = _TRI * ntxp            # input tile rows: out + 1 halo each side
    rows_i = _BR + 2 * _TOP         # target image rows

    def dmas(band, slot):
        return (
            pltpu.make_async_copy(
                pred_hbm.at[:, pl.ds(band * _TRO * ntxp, rows_t), :],
                pv.at[slot], sem.at[slot, 0]),
            pltpu.make_async_copy(
                targ_hbm.at[:, pl.ds(band * _BR, rows_i), :],
                tv.at[slot], sem.at[slot, 1]),
        )

    slot = jax.lax.rem(j, 2)

    @pl.when(j == 0)
    def _():
        for d in dmas(j, slot):
            d.start()

    @pl.when(j + 1 < nb)
    def _():
        for d in dmas(j + 1, 1 - slot):
            d.start()
    for d in dmas(j, slot):
        d.wait()

    tops = rows_i - _HALO            # window-top rows computable in-band
    tloc = jax.lax.broadcasted_iota(jnp.int32, (tops, wp), 0)
    ctop = jax.lax.broadcasted_iota(jnp.int32, (tops, wp), 1)
    real_top = j * _BR - _TOP + tloc
    tvalid = ((real_top >= 0) & (real_top < h - _HALO)
              & (ctop < w - _HALO)).astype(jnp.float32)
    # each band OWNS the window tops starting in its pixel rows: the value
    # sum counts every valid window exactly once across bands
    vown = ((real_top >= j * _BR) & (real_top < (j + 1) * _BR)
            & (real_top < h - _HALO) & (ctop < w - _HALO)).astype(
                jnp.float32)
    rloc = jax.lax.broadcasted_iota(jnp.int32, (_BR, wp), 0)
    cpix = jax.lax.broadcasted_iota(jnp.int32, (_BR, wp), 1)
    pvalid = ((j * _BR + rloc < h) & (cpix < w)).astype(jnp.float32)
    adj0 = _TOP - _HALO

    l1_acc = jnp.zeros((), jnp.float32)
    ssim_acc = jnp.zeros((), jnp.float32)
    mse_acc = jnp.zeros((), jnp.float32)
    for c in range(3):
        # merge the input tile rows into image rows (VMEM transposes only)
        x = jnp.concatenate(
            [_merge(pv[slot, c, r * ntxp:(r + 1) * ntxp, :], ntxp, ts)
             for r in range(_TRI)], axis=0)                  # (rows_i, wp)
        y = tv[slot, c]                                      # (96, wp)
        X, Y, X2, Y2, XY = _moments(x, y, tops, kern)
        n1, n2, d1, d2 = _ssim_terms(X, Y, X2, Y2, XY, c1, c2)
        inv = 1.0 / (d1 * d2)
        s = n1 * n2 * inv
        ssim_acc = ssim_acc + jnp.sum(s * vown)
        # per-window partials -> adjoint blur (see ssim_pallas docstring)
        dX = (2.0 * Y * (n2 - n1) * inv
              - 2.0 * s * X * (1.0 / d1 - 1.0 / d2)) * tvalid
        dM2 = (-s / d2) * tvalid
        dXY = (2.0 * n1 * inv) * tvalid
        bA = _vblur(_hblur(dX, kern, _HALO)[adj0:], _BR, kern)
        bM2 = _vblur(_hblur(dM2, kern, _HALO)[adj0:], _BR, kern)
        bXY = _vblur(_hblur(dXY, kern, _HALO)[adj0:], _BR, kern)
        xc = x[_TOP:_TOP + _BR, :]
        yc = y[_TOP:_TOP + _BR, :]
        diff = (xc - yc) * pvalid
        l1_acc = l1_acc + jnp.sum(jnp.abs(diff))
        mse_acc = mse_acc + jnp.sum(diff * diff)
        g = (s_ssim * (bA + 2.0 * xc * bM2 + yc * bXY)
             + s_l1 * jnp.sign(diff)) * pvalid
        # split the gradient rows back into output tile rows
        for r in range(_TRO):
            dflat_ref[c, r * ntxp:(r + 1) * ntxp, :] = _split(
                g[r * ts:(r + 1) * ts, :], ntxp, ts)

    # the (8, 128) sums block is resident across the whole sequential grid
    # (same block index every step): lane 0 = L1, 1 = SSIM, 2 = MSE sums
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    vals = jnp.where((row == 0) & (lane == 0), l1_acc, 0.0)
    vals = vals + jnp.where((row == 0) & (lane == 1), ssim_acc, 0.0)
    vals = vals + jnp.where((row == 0) & (lane == 2), mse_acc, 0.0)

    @pl.when(j == 0)
    def _():
        sums_ref[...] = vals

    @pl.when(j > 0)
    def _():
        sums_ref[...] = sums_ref[...] + vals


def _run_kernel(pred_flat, targ_pad, ntx, nty, ts, h, w, ssim_weight,
                interpret, c1, c2):
    ntxp, nb, t_rows, wp, ht = _layout(ntx, nty, ts, h, w)
    assert pred_flat.shape == (3, t_rows * ntxp, ts * ts), pred_flat.shape
    assert targ_pad.shape == (3, ht, wp), (targ_pad.shape, (3, ht, wp))
    n_pix = 3.0 * h * w
    n_win = 3.0 * (h - _HALO) * (w - _HALO)
    kern = _kern()
    kernel = functools.partial(
        _loss_kernel, ntxp=ntxp, ts=ts, h=h, w=w, wp=wp, c1=c1, c2=c2,
        kern=kern, s_l1=(1.0 - ssim_weight) / n_pix,
        s_ssim=-ssim_weight / n_win, nb=nb)
    pix = ts * ts
    dflat, sums = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=(
            pl.BlockSpec((3, _TRO * ntxp, pix), lambda j: (0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, _TRO * nb * ntxp, pix), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 3, _TRI * ntxp, pix), jnp.float32),
            pltpu.VMEM((2, 3, _BR + 2 * _TOP, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(pred_flat, targ_pad)
    l1_sum, ssim_sum, mse_sum = sums[0, 0], sums[0, 1], sums[0, 2]
    loss = ((1.0 - ssim_weight) * (l1_sum / n_pix)
            + ssim_weight * (1.0 - ssim_sum / n_win))
    mse = mse_sum / n_pix
    return loss, mse, dflat


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def fused_photometric_loss(tiles3, target_pad, ntx: int, nty: int, ts: int,
                           h: int, w: int, ssim_weight: float,
                           interpret: bool | None = None):
    """(loss, mse) of the 3DGS objective, tile-native and pre-differentiated.

    tiles3: (NG, 3, GT, ts*ts) rasterizer output (RGB channels);
    target_pad: from ``pad_target_chw``. Numerically equivalent to
    (1-w)*tile_l1 + w*(1-fused_ssim(untile(tiles))) with the pixel-validity
    masks of train_step (tested); ``mse`` matches ``tile_psnr``'s mean
    squared error. The VJP flows ONLY through ``loss`` (mse is a metrics
    tap -- its cotangent is ignored; wrap in stop_gradient if unsure) and
    returns the gradient precomputed by the forward band pass, scaled by
    the loss cotangent.
    """
    (loss, mse), _ = _fpl_fwd(tiles3, target_pad, ntx, nty, ts, h, w,
                              ssim_weight, interpret)
    return loss, mse


def _fpl_fwd(tiles3, target_pad, ntx, nty, ts, h, w, ssim_weight,
             interpret):
    if interpret is None:
        interpret = _interp_default()
    ntxp, nb, _, _, _ = _layout(ntx, nty, ts, h, w)
    flat = flatten_tiles(tiles3, ntx, nty, ts, nb, ntxp)
    loss, mse, dflat = _run_kernel(flat, target_pad, ntx, nty, ts, h, w,
                                   ssim_weight, interpret, 0.01 ** 2,
                                   0.03 ** 2)
    return (loss, mse), (dflat, tiles3.shape, target_pad)


def _fpl_bwd(ntx, nty, ts, h, w, ssim_weight, interpret, res, g):
    dflat, tshape, target_pad = res
    g_loss, _ = g                    # mse is a metrics tap: cotangent dropped
    ng, _, gt, _ = tshape
    ntxp, nb, _, _, _ = _layout(ntx, nty, ts, h, w)
    d_tiles = unflatten_grad(dflat * g_loss, ng, gt, ntx, nty, nb, ntxp)
    return d_tiles, jnp.zeros_like(target_pad)


fused_photometric_loss.defvjp(_fpl_fwd, _fpl_bwd)
