"""Fused Pallas SSIM: one-pass windowed statistics + hand-derived backward.

The reference has no SSIM (no training at all, SURVEY.md §0); the 3DGS
objective needs mean SSIM over 11x11 gaussian windows at full resolution
every step. XLA's depthwise-conv lowering of the separable blur costs
~175 ms forward / ~317 ms fwd+bwd at treehill scale (measured on v5e) --
20x the analytic HBM bound -- because each of the 5 blurred moment fields
round-trips HBM twice and the tiny 11-tap convs stay VPU-bound with poor
layouts.

This kernel computes everything in one pass over row bands held in VMEM:
DMA a (3, BR+10, W) band of both images, form the five moment fields
(x, y, x**2, y**2, xy), apply the separable 11-tap blur as 11 static
sublane slices (vertical) and 11 lane rolls (horizontal), evaluate the
SSIM map, and reduce to a per-band partial sum. HBM traffic = read the two
images once (plus 10-row halo), write ~nothing.

The backward pass exploits that the blur operator B is linear and
self-adjoint (symmetric kernel): with moments X=B(x), Y=B(y), X2=B(x^2),
Y2=B(y^2), XY=B(xy) and s = N1*N2/(D1*D2), the pixel gradient is

    dL/dx = g * [ B(ds/dX) + 2x.B(ds/dX2) + y.B(ds/dXY) ]

so the backward is ONE more banded pass: recompute window coefficients for
the band (+10-row halo), blur them back, and combine with the centered
pixels -- no stored intermediates, same traffic as the forward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WINDOW = 11
_HALO = WINDOW - 1          # 10
# Output rows per band. Each band re-reads a _TOP-row halo, so larger bands
# amortize halo traffic (1.25x image reads at 64 vs 2x at 16) and cut the
# sequential grid step count; 4 double-buffered (3, 96, Wp) band buffers
# are ~24 MB VMEM at treehill width -- well inside the chip. (_BR = 128
# compiles ~5x slower in Mosaic with no measured runtime win; keep 64.)
_BR = 64
# HBM DMA row slices must be 8-aligned on TPU: the image is stored with 16
# rows of top padding so every band's DMA starts at a multiple of 8 and
# reads 8-divisible row counts (the 6 extra rows per band are masked).
_TOP = 16


@functools.lru_cache(maxsize=None)
def _kern(sigma: float = 1.5):
    ax = np.arange(WINDOW) - (WINDOW - 1) / 2.0
    g = np.exp(-(ax ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return tuple(float(v) for v in g)


def _vblur(x, rows_out: int, kern):
    """Vertical 11-tap blur via static sublane slices: (R, W) -> (rows_out, W)."""
    acc = kern[0] * x[0:rows_out, :]
    for k in range(1, WINDOW):
        acc = acc + kern[k] * x[k:k + rows_out, :]
    return acc


def _hblur(x, kern, shift0: int = 0):
    """Horizontal 11-tap blur via lane rolls.

    shift0=0:  out[c] = sum_k w_k x[c + k]        (forward window blur)
    shift0=10: out[c] = sum_k w_k x[c - 10 + k]   (adjoint spread to pixels)
    Wrap-around lanes must be zero in x (the wrapper's masks guarantee it).
    """
    n = x.shape[1]
    acc = None
    for k in range(WINDOW):
        shifted = pltpu.roll(x, shift=(shift0 - k) % n, axis=1)
        acc = kern[k] * shifted if acc is None else acc + kern[k] * shifted
    return acc


def _moments(x, y, rows_out, kern):
    X = _hblur(_vblur(x, rows_out, kern), kern)
    Y = _hblur(_vblur(y, rows_out, kern), kern)
    X2 = _hblur(_vblur(x * x, rows_out, kern), kern)
    Y2 = _hblur(_vblur(y * y, rows_out, kern), kern)
    XY = _hblur(_vblur(x * y, rows_out, kern), kern)
    return X, Y, X2, Y2, XY


def _ssim_terms(X, Y, X2, Y2, XY, c1: float, c2: float):
    sx = X2 - X * X
    sy = Y2 - Y * Y
    sxy = XY - X * Y
    n1 = 2.0 * X * Y + c1
    n2 = 2.0 * sxy + c2
    d1 = X * X + Y * Y + c1
    d2 = sx + sy + c2
    return n1, n2, d1, d2


def _fwd_kernel(xp, yp, out_ref, xv, yv, sem,
                *, h, w, wp, c1, c2, kern):
    """Band i's DMAs are started by band i-1 (band 0 starts its own), so
    each band's moment math overlaps the next band's HBM reads -- the
    sequential Mosaic grid keeps the revolving scratch slots and their
    semaphores live across programs."""
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    rows_in = _BR + _TOP

    def dmas(band, slot):
        return (
            pltpu.make_async_copy(
                xp.at[:, pl.ds(band * _BR + _TOP, rows_in), :],
                xv.at[slot], sem.at[slot, 0]),
            pltpu.make_async_copy(
                yp.at[:, pl.ds(band * _BR + _TOP, rows_in), :],
                yv.at[slot], sem.at[slot, 1]),
        )

    slot = jax.lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        for d in dmas(i, slot):
            d.start()

    @pl.when(i + 1 < nb)
    def _():
        for d in dmas(i + 1, 1 - slot):
            d.start()
    for d in dmas(i, slot):
        d.wait()

    rloc = jax.lax.broadcasted_iota(jnp.int32, (_BR, wp), 0)
    cloc = jax.lax.broadcasted_iota(jnp.int32, (_BR, wp), 1)
    valid = ((i * _BR + rloc < h - _HALO) & (cloc < w - _HALO)).astype(
        jnp.float32)

    acc = jnp.zeros((), jnp.float32)
    for c in range(3):
        x = xv[slot, c]
        y = yv[slot, c]
        n1, n2, d1, d2 = _ssim_terms(*_moments(x, y, _BR, kern), c1, c2)
        s = (n1 * n2) / (d1 * d2)
        acc = acc + jnp.sum(s * valid)
    # the whole (NB, 128) partial-sum array lives as one resident VMEM
    # block (Mosaic needs (8,128)-divisible or full-array blocks); each
    # program writes its own row, wrapper reads lane 0
    out_ref[pl.ds(i, 1), :] = jnp.full((1, 128), acc, jnp.float32)


def _bwd_kernel(g_ref, xp, yp, *rest,
                h, w, wp, c1, c2, kern, grad_target, emit_value=False):
    """Pixel-gradient band pass; with ``emit_value`` also accumulates the
    per-band SSIM value partial sums into ``val_ref`` -- the moments are
    already in registers, so the forward value comes along for ~free (ONE
    banded pass instead of forward + backward; the training path always
    needs both). Output refs in order: dx, [dy,] [val]."""
    rest = list(rest)
    dx_ref = rest.pop(0)
    dy_ref = rest.pop(0) if grad_target else None
    xv, yv, sem = rest
    j = pl.program_id(0)
    nb = pl.num_programs(0)
    rows_in = _BR + 2 * _TOP         # local row l = real row j*BR - TOP + l
    tops = rows_in - _HALO           # window-top rows computable in-band

    def dmas(band, slot):
        return (
            pltpu.make_async_copy(
                xp.at[:, pl.ds(band * _BR, rows_in), :], xv.at[slot],
                sem.at[slot, 0]),
            pltpu.make_async_copy(
                yp.at[:, pl.ds(band * _BR, rows_in), :], yv.at[slot],
                sem.at[slot, 1]),
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
    g = g_ref[0, 0]

    # validity of window tops: real top = j*BR - TOP + lt for local lt
    tloc = jax.lax.broadcasted_iota(jnp.int32, (tops, wp), 0)
    ctop = jax.lax.broadcasted_iota(jnp.int32, (tops, wp), 1)
    real_top = j * _BR - _TOP + tloc
    tvalid = ((real_top >= 0) & (real_top < h - _HALO)
              & (ctop < w - _HALO)).astype(jnp.float32)
    # validity of output pixels
    rloc = jax.lax.broadcasted_iota(jnp.int32, (_BR, wp), 0)
    cpix = jax.lax.broadcasted_iota(jnp.int32, (_BR, wp), 1)
    pvalid = ((j * _BR + rloc < h) & (cpix < w)).astype(jnp.float32)
    # pixel real row p = j*BR + r receives sum_k w_k tops[p - HALO + k];
    # local top index of p - HALO = r + TOP - HALO
    adj0 = _TOP - _HALO
    if emit_value:
        # each band OWNS the window-tops starting in its pixel rows, so the
        # value sum counts every valid window exactly once across bands
        vown = ((real_top >= j * _BR) & (real_top < (j + 1) * _BR)
                & (real_top < h - _HALO)
                & (ctop < w - _HALO)).astype(jnp.float32)
        vacc = jnp.zeros((), jnp.float32)

    for c in range(3):
        x = xv[slot, c]
        y = yv[slot, c]
        X, Y, X2, Y2, XY = _moments(x, y, tops, kern)
        n1, n2, d1, d2 = _ssim_terms(X, Y, X2, Y2, XY, c1, c2)
        inv = 1.0 / (d1 * d2)
        s = n1 * n2 * inv
        if emit_value:
            vacc = vacc + jnp.sum(s * vown)
        # per-window partials (see module docstring)
        dX = (2.0 * Y * (n2 - n1) * inv
              - 2.0 * s * X * (1.0 / d1 - 1.0 / d2)) * tvalid
        dM2 = (-s / d2) * tvalid           # d/dX2 == d/dY2
        dXY = (2.0 * n1 * inv) * tvalid
        # adjoint blur: horizontal spread then vertical gather
        bA_x = _vblur(_hblur(dX, kern, _HALO)[adj0:], _BR, kern)
        bM2 = _vblur(_hblur(dM2, kern, _HALO)[adj0:], _BR, kern)
        bXY = _vblur(_hblur(dXY, kern, _HALO)[adj0:], _BR, kern)
        xc = x[_TOP:_TOP + _BR, :]
        yc = y[_TOP:_TOP + _BR, :]
        dx_ref[c] = g * pvalid * (bA_x + 2.0 * xc * bM2 + yc * bXY)
        if grad_target:
            dY = (2.0 * X * (n2 - n1) * inv
                  - 2.0 * s * Y * (1.0 / d1 - 1.0 / d2)) * tvalid
            bA_y = _vblur(_hblur(dY, kern, _HALO)[adj0:], _BR, kern)
            dy_ref[c] = g * pvalid * (bA_y + 2.0 * yc * bM2 + xc * bXY)
    if emit_value:
        # stash the band's value partial in the dx image's PAD lane block
        # (the wrapper widens wp by 128 so lanes [wp-128, wp) are always
        # past the true width): same two-output structure as the plain
        # backward -- a third output or a whole-array-resident value block
        # both made the Mosaic compile time blow up with the band count
        dx_ref[0, 0:8, wp - 128:] = jnp.full((8, 128), vacc, jnp.float32)


def _pad_inputs(pred, target, nb_rows: int, wp: int):
    """(3, H, W) -> (3, TOP + nb_rows*BR + TOP, Wp), zero padded, with the
    real image starting at row TOP (8-aligned band DMAs)."""
    _, h, w = pred.shape
    hp = 2 * _TOP + nb_rows * _BR
    pad = ((0, 0), (_TOP, hp - h - _TOP), (0, wp - w))
    return jnp.pad(pred, pad), jnp.pad(target, pad)


def _grids(h: int, w: int):
    nb_f = -(-(h - _HALO) // _BR)    # window-top bands (forward)
    nb_b = -(-h // _BR)              # pixel bands (backward)
    nb_rows = max(nb_f, nb_b)
    wp = ((w + 127) // 128) * 128
    return nb_f, nb_b, nb_rows, wp


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_ssim_sum(pred, target, c1: float = 0.01 ** 2,
                   c2: float = 0.03 ** 2, interpret: bool | None = None,
                   grad_target: bool = True):
    """Sum of per-window SSIM over all channels and valid 11x11 windows.

    pred/target: (3, H, W) channel-major. Divide by 3*(H-10)*(W-10) for the
    mean (see fused_ssim). Gradients flow to BOTH inputs unless
    ``grad_target=False`` (training: the ground truth is constant, so the
    backward kernel skips computing + writing the ~200 MB target gradient).
    """
    s, _ = _fused_ssim_fwd(pred, target, c1, c2, interpret, grad_target)
    return s


def _interp_default():
    return jax.default_backend() != "tpu"


def _fused_ssim_fwd(pred, target, c1, c2, interpret, grad_target=True):
    del grad_target  # forward is identical; flag only shapes the backward
    if interpret is None:
        interpret = _interp_default()
    _, h, w = pred.shape
    assert h > _HALO and w > _HALO, "image smaller than the SSIM window"
    nb_f, _, nb_rows, wp = _grids(h, w)
    xp, yp = _pad_inputs(pred, target, nb_rows, wp)
    kern = _kern()
    kernel = functools.partial(_fwd_kernel, h=h, w=w, wp=wp, c1=c1, c2=c2,
                               kern=kern)
    rows_in = _BR + _TOP
    partial = pl.pallas_call(
        kernel,
        grid=(nb_f,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec((nb_f, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb_f, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 3, rows_in, wp), jnp.float32),
            pltpu.VMEM((2, 3, rows_in, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, yp)
    return jnp.sum(partial[:, 0]), (pred, target)


def _fused_ssim_bwd(c1, c2, interpret, grad_target, res, g):
    if interpret is None:
        interpret = _interp_default()
    pred, target = res
    _, h, w = pred.shape
    _, nb_b, nb_rows, wp = _grids(h, w)
    xp, yp = _pad_inputs(pred, target, nb_rows, wp)
    kern = _kern()
    kernel = functools.partial(_bwd_kernel, h=h, w=w, wp=wp, c1=c1, c2=c2,
                               kern=kern, grad_target=grad_target)
    rows_in = _BR + 2 * _TOP
    blk = pl.BlockSpec((3, _BR, wp), lambda j: (0, j, 0),
                       memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((3, nb_b * _BR, wp), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(nb_b,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(blk, blk) if grad_target else (blk,),
        out_shape=(shp, shp) if grad_target else (shp,),
        scratch_shapes=[
            pltpu.VMEM((2, 3, rows_in, wp), jnp.float32),
            pltpu.VMEM((2, 3, rows_in, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(jnp.reshape(g, (1, 1)).astype(jnp.float32), xp, yp)
    if grad_target:
        dx, dy = out
        return dx[:, :h, :w], dy[:, :h, :w]
    # the zeros cotangent for the constant target is dropped by the caller's
    # AD graph (no consumer), so XLA never materializes it
    return out[0][:, :h, :w], jnp.zeros_like(target)


fused_ssim_sum.defvjp(_fused_ssim_fwd, _fused_ssim_bwd)


# ---------------------------------------------------------------------------
# Fused value+gradient: ONE banded pass for training.
#
# The split fwd/bwd above runs 13 blur chains per image pair (5 forward
# moments, then 5 recomputed moments + 3 adjoint blurs in the backward).
# Training ALWAYS takes the gradient, so the band pass that computes the
# pixel gradient also accumulates the value from the same in-register
# moments: 8 blur chains total, ~40% less VPU work. The unit-cotangent
# gradient image is saved as the VJP residual (~200 MB at treehill scale --
# cheaper than a full recompute pass).
# ---------------------------------------------------------------------------

def _ssim_vg_pallas(pred, target, c1, c2, interpret, grad_target):
    """(value_sum, dx_unit, dy_unit|None) in one fused band pass."""
    _, h, w = pred.shape
    assert h > _HALO and w > _HALO, "image smaller than the SSIM window"
    _, nb_b, nb_rows, wp = _grids(h, w)
    wp = wp + 128     # guaranteed pad lane block to carry the value partials
    xp, yp = _pad_inputs(pred, target, nb_rows, wp)
    kern = _kern()
    kernel = functools.partial(_bwd_kernel, h=h, w=w, wp=wp, c1=c1, c2=c2,
                               kern=kern, grad_target=grad_target,
                               emit_value=True)
    rows_in = _BR + 2 * _TOP
    blk = pl.BlockSpec((3, _BR, wp), lambda j: (0, j, 0),
                       memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((3, nb_b * _BR, wp), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(nb_b,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(blk, blk) if grad_target else (blk,),
        out_shape=(shp, shp) if grad_target else (shp,),
        scratch_shapes=[
            pltpu.VMEM((2, 3, rows_in, wp), jnp.float32),
            pltpu.VMEM((2, 3, rows_in, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(jnp.ones((1, 1), jnp.float32), xp, yp)
    dx = out[0]
    dy = out[1][:, :h, :w] if grad_target else None
    val = jnp.sum(dx[0, ::_BR, wp - 128])
    return val, dx[:, :h, :w], dy


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_ssim_sum_vg(pred, target, c1: float = 0.01 ** 2,
                      c2: float = 0.03 ** 2, interpret: bool | None = None,
                      grad_target: bool = True):
    """Like fused_ssim_sum, but the forward already computes (and stores)
    the pixel gradient -- use on paths that ALWAYS differentiate."""
    s, _ = _vg_fwd(pred, target, c1, c2, interpret, grad_target)
    return s


def _vg_fwd(pred, target, c1, c2, interpret, grad_target):
    if interpret is None:
        interpret = _interp_default()
    s, dx, dy = _ssim_vg_pallas(pred, target, c1, c2, interpret,
                                grad_target)
    return s, (dx, dy, target)


def _vg_bwd(c1, c2, interpret, grad_target, res, g):
    dx, dy, target = res
    if grad_target:
        return g * dx, g * dy
    return g * dx, jnp.zeros_like(target)


fused_ssim_sum_vg.defvjp(_vg_fwd, _vg_bwd)


def fused_ssim(pred_chw: jax.Array, target_chw: jax.Array,
               c1: float = 0.01 ** 2, c2: float = 0.03 ** 2,
               interpret: bool | None = None,
               grad_target: bool = True,
               precompute_grad: bool = False) -> jax.Array:
    """Mean SSIM over channel-major (3, H, W) images -- fused Pallas path.

    Numerically equivalent to train.loss.ssim_chw (same gaussian window,
    sigma=1.5); measured 19x (fwd) / 11x (fwd+bwd) faster at treehill scale
    on v5e. Pass grad_target=False when the target is a constant.
    ``precompute_grad=True`` runs the single fused value+gradient band pass
    (8 blur chains instead of 13) and stores the unit pixel gradient as the
    VJP residual. CAVEAT: the three-output kernel's Mosaic compile time
    grows pathologically with image size on the current toolchain (>10 min
    at treehill resolution vs ~1 min for the split path), so the trainer
    keeps the split default; the fused path is tested and available for
    toolchains where the compile is sane.
    """
    _, h, w = pred_chw.shape
    count = 3.0 * (h - _HALO) * (w - _HALO)
    op = fused_ssim_sum_vg if precompute_grad else fused_ssim_sum
    return op(pred_chw, target_chw, c1, c2, interpret, grad_target) / count
