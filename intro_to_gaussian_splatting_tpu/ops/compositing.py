"""Front-to-back alpha compositing, formulated for the MXU.

The reference composites with a per-pixel Python loop carrying transmittance
T and breaking when T drops below a threshold (splat/gaussian_scene.py:146-171)
or one CUDA thread per pixel doing the same scan (splat/c/render.cu:49-81).
Neither maps to a TPU: there is no per-lane "break", and scalar loops starve
the vector units.

TPU-native formulation: compositing is a prefix product, and prefix sums are
matmuls against a constant triangular matrix -- which the MXU does at full
throughput. For a block of P pixels and a chunk of G depth-ordered gaussians:

    alpha[p,i]   = clamp(opacity_i * exp(-0.5 d^T Sigma^-1 d), 0, 0.99)
    s            = log1p(-alpha)                      # (P, G) elementwise, VPU
    S_excl       = s @ L_strict                       # (P, G) = prefix sums, MXU
    T[p,i]       = T_carry[p] * exp(S_excl[p,i])      # transmittance before i
    include[p,i] = T[p,i] * (1 - alpha[p,i]) >= t_threshold
    W            = T * alpha * include                # contribution weights
    color_block  = W @ colors_chunk                   # (P, 3), MXU
    T_carry     *= exp(S_excl[:, -1] + s[:, -1])

``include`` reproduces the reference's early-exit *exactly*: with alpha <=
alpha_clamp < 1, T is monotone decreasing, so "the first gaussian whose
composite would push T below threshold breaks the loop permanently"
(gaussian_scene.py:165-167, render.cu:72-76) is equivalent to the pointwise
test above. (When emulating the un-clamped reference Python path, alpha can
exceed 1 and monotonicity fails; ``exact_break=True`` adds an inclusive
prefix-OR -- one more triangular matmul -- to freeze saturated pixels.)

The same chunk function is used by the dense oracle renderer here, by the
pure-JAX tiled renderer, and inside the Pallas TPU kernel, so all backends
share one definition of the math.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from intro_to_gaussian_splatting_tpu.config import RasterizerConfig
from intro_to_gaussian_splatting_tpu.models.camera import Camera
from intro_to_gaussian_splatting_tpu.models.gaussians import GaussianModel
from intro_to_gaussian_splatting_tpu.ops import projection as P
from intro_to_gaussian_splatting_tpu.ops.projection import (
    ProjectedGaussians,
    pack_records,
    project_gaussians,
)

# Floor on log1p(-alpha): e^-30 ~ 1e-13 is far below every T threshold, so
# clamping here never changes which gaussians composite, but keeps -inf out
# of the prefix matmuls.
_LOG_FLOOR = -30.0


def strict_lower_triangle(g: int, dtype=jnp.float32) -> jax.Array:
    """L[j, i] = 1 where j < i, so (s @ L)[:, i] = exclusive prefix sum."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
    return (rows < cols).astype(dtype)


def incl_lower_triangle(g: int, dtype=jnp.float32) -> jax.Array:
    rows = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
    return (rows <= cols).astype(dtype)


def _shift_right(x: jax.Array, k: int) -> jax.Array:
    """Shift right by k along the lane (last) axis, zeros shifted in."""
    if k == 0:
        return x
    pad = jnp.zeros(x.shape[:-1] + (k,), x.dtype)
    return jnp.concatenate([pad, x[..., :-k]], axis=-1)


def prefix_sum_incl(x: jax.Array) -> jax.Array:
    """Inclusive prefix sum along lanes via a log-step shift-add scan.

    Replaces the (P, G) @ (G, G) triangular matmul: O(G log G) VPU work
    instead of O(G^2) MXU MACs (6 bf16 passes each at fp32-HIGHEST), and
    sequential fp32 summation order, which is *more* accurate.
    """
    g = x.shape[-1]
    k = 1
    while k < g:
        x = x + _shift_right(x, k)
        k *= 2
    return x




class CompositeCarry(NamedTuple):
    transmittance: jax.Array  # (P, 1)
    accum: jax.Array          # (P, NUM_PAYLOAD) = [r, g, b, depth, alpha]
    alive: jax.Array          # (P, 1) f32; only consulted when exact_break


def init_carry(num_pixels: int, dtype=jnp.float32) -> CompositeCarry:
    return CompositeCarry(
        transmittance=jnp.ones((num_pixels, 1), dtype),
        accum=jnp.zeros((num_pixels, P.NUM_PAYLOAD), dtype),
        alive=jnp.ones((num_pixels, 1), dtype),
    )


def _row(rec, i):
    """Row i of the (NUM_REC_ROWS, G) record block as (1, G).

    Written 2D-safe (slice, not integer index) so the same code lowers inside
    Pallas kernels, where 1-D intermediates are not supported on TPU."""
    return rec[i:i + 1, :]


def gaussian_alpha(px, py, rec, config: RasterizerConfig):
    """Raw (unclamped) alpha of each gaussian at each pixel.

    px, py: (P, 1) pixel coordinates; rec: (NUM_REC_ROWS, G) records.
    Returns (P, G). Matches ref utils.py:357-365 + gaussian_scene.py:164.
    """
    dx = px - _row(rec, P.REC_MEAN_X)
    dy = py - _row(rec, P.REC_MEAN_Y)
    power = (_row(rec, P.REC_CONIC_A) * dx * dx
             + 2.0 * _row(rec, P.REC_CONIC_B) * dx * dy
             + _row(rec, P.REC_CONIC_C) * dy * dy)
    weight = jnp.exp(-0.5 * power)
    return _row(rec, P.REC_OPACITY) * weight


def effective_alpha(alpha_raw, px, py, rec, gmask, config: RasterizerConfig):
    """Clamp + mask the raw alpha. gmask: (1, G) or (P, G) inclusion mask."""
    a = jnp.clip(alpha_raw, 0.0, config.alpha_clamp)
    if config.alpha_min > 0.0:
        a = jnp.where(alpha_raw >= config.alpha_min, a, 0.0)
    if config.compat.pixel_bbox_test:
        # CUDA path rejects pixels outside the gaussian's own bbox
        # (render.cu:55-60); bbox tests are inclusive on both ends.
        inb = ((px >= _row(rec, P.REC_MIN_X))
               & (px <= _row(rec, P.REC_MAX_X))
               & (py >= _row(rec, P.REC_MIN_Y))
               & (py <= _row(rec, P.REC_MAX_Y)))
        a = jnp.where(inb, a, 0.0)
    return a * gmask.astype(a.dtype)


def composite_chunk(
    carry: CompositeCarry,
    px: jax.Array,
    py: jax.Array,
    rec: jax.Array,
    gmask: jax.Array,
    config: RasterizerConfig,
    exact_break: bool = False,
) -> CompositeCarry:
    """Composite one chunk of G depth-ordered gaussians into P pixels."""
    hi = jax.lax.Precision.HIGHEST
    alpha_raw = gaussian_alpha(px, py, rec, config)
    a = effective_alpha(alpha_raw, px, py, rec, gmask, config)

    s = jnp.maximum(jnp.log1p(-a), _LOG_FLOOR)
    s_incl = prefix_sum_incl(s)
    s_excl = s_incl - s
    T = carry.transmittance * jnp.exp(s_excl)                       # (P, G)

    if exact_break:
        # Reference-Python semantics: the break test uses the *unclamped*
        # alpha, and saturation is permanent even where monotonicity fails.
        masked_raw = jnp.where(a > 0.0, alpha_raw, 0.0)
        bad = (T * (1.0 - masked_raw)
               < config.t_threshold).astype(jnp.float32)
        done = prefix_sum_incl(bad) > 0.0
        include = carry.alive * (1.0 - done.astype(jnp.float32))
        new_alive = carry.alive * (1.0 - (done[:, -1:]).astype(jnp.float32))
    else:
        include = (T * (1.0 - a) >= config.t_threshold).astype(jnp.float32)
        new_alive = carry.alive

    w = T * a * include                                              # (P, G)
    payload = rec[P.PAYLOAD_START:, :]                               # (5, G)
    accum = carry.accum + jax.lax.dot_general(
        w, payload, (((1,), (1,)), ((), ())),
        precision=hi, preferred_element_type=jnp.float32)
    t_new = carry.transmittance * jnp.exp(s_incl[:, -1:])
    return CompositeCarry(transmittance=t_new, accum=accum, alive=new_alive)


# ---------------------------------------------------------------------------
# Dense oracle renderer: every pixel against every gaussian, no binning.
# O(pixels * N) -- for tests and small scenes; it is the semantic ground
# truth that the tiled/Pallas backends must match.
# ---------------------------------------------------------------------------

def tile_overlap_mask(px, py, rec, config: RasterizerConfig):
    """(P, G) mask: does the gaussian's bbox overlap the pixel's tile?

    Emulates the tile-level binning test of the tiled backends so the dense
    renderer produces bit-identical output. Reference overlap test is
    inclusive of the next tile's first pixel (gaussian_scene.py:209-218),
    controlled by compat.inclusive_tile_overlap.
    """
    ts = config.tile_size
    tx0 = (px // ts) * ts  # tile origin of each pixel, (P, 1)
    ty0 = (py // ts) * ts
    if config.compat.inclusive_tile_overlap:
        hi = float(ts)
    else:
        hi = float(ts - 1)
    x_ov = ((_row(rec, P.REC_MIN_X) <= tx0 + hi)
            & (_row(rec, P.REC_MAX_X) >= tx0))
    y_ov = ((_row(rec, P.REC_MIN_Y) <= ty0 + hi)
            & (_row(rec, P.REC_MAX_Y) >= ty0))
    return x_ov & y_ov


@partial(jax.jit, static_argnames=("config", "tile_culling", "exact_break",
                                   "chunk", "active_sh_degree", "return_aux"))
def render_dense(
    model: GaussianModel,
    camera: Camera,
    config: RasterizerConfig = RasterizerConfig(),
    tile_culling: bool = True,
    exact_break: bool = False,
    chunk: int = 256,
    active_sh_degree: Optional[int] = None,
    return_aux: bool = False,
) -> jax.Array:
    """Render (height, width, 3) by compositing all gaussians per pixel.

    Functional equivalent of ``GaussianScene.render_image``
    (splat/gaussian_scene.py:200-238) minus the 5-minute Python loops.
    With ``return_aux=True`` also returns alpha, depth, and the EXACT final
    transmittance Π(1-αᵢ) over all gaussians (the oracle quantity for the
    tiled backends' ``1 - alpha`` approximation, which excludes the
    sub-t_threshold tail).
    """
    proj = project_gaussians(model, camera, config, active_sh_degree)
    rec, order = _sorted_records(proj)
    h, w = camera.height, camera.width
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).reshape(-1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).reshape(-1)
    px = xs.astype(jnp.float32)[:, None]
    py = ys.astype(jnp.float32)[:, None]

    gvalid = proj.valid[order]
    n = rec.shape[1]
    pad = (-n) % chunk
    rec = jnp.pad(rec, ((0, 0), (0, pad)))
    gvalid = jnp.pad(gvalid, (0, pad))

    num_pix = h * w
    carry = init_carry(num_pix)

    def body(carry, xs_chunk):
        rec_c, gvalid_c = xs_chunk
        if tile_culling:
            gmask = gvalid_c[None, :] & tile_overlap_mask(px, py, rec_c, config)
        else:
            gmask = gvalid_c[None, :]
        return composite_chunk(
            carry, px, py, rec_c, gmask, config, exact_break=exact_break
        ), None

    rec_chunks = rec.reshape(P.NUM_REC_ROWS, -1, chunk).transpose(1, 0, 2)
    valid_chunks = gvalid.reshape(-1, chunk)
    carry, _ = jax.lax.scan(body, carry, (rec_chunks, valid_chunks))

    image = carry.accum[:, :3].reshape(h, w, 3)
    if config.compat.skip_last_tile:
        # ref renders only x in [0, width - tile_size) etc. rounded to tiles
        # (gaussian_scene.py:208,214): blank the unrendered margin.
        ts = config.tile_size
        lim_x = ((w - ts - 1) // ts + 1) * ts if w > ts else 0
        lim_y = ((h - ts - 1) // ts + 1) * ts if h > ts else 0
        xmask = (xs < lim_x) & (ys < lim_y)
        image = image * xmask.reshape(h, w, 1).astype(image.dtype)
    if return_aux:
        aux = dict(
            depth=carry.accum[:, 3].reshape(h, w),
            alpha=carry.accum[:, 4].reshape(h, w),
            transmittance=carry.transmittance[:, 0].reshape(h, w),
        )
        return image, aux
    return image


def _sorted_records(proj: ProjectedGaussians):
    """Depth-sort (front to back) and pack records; invalid slots sort last.

    ref: global ascending argsort on camera z, gaussian_scene.py:117-129."""
    key = jnp.where(proj.valid, proj.depth, jnp.inf)
    order = jnp.argsort(key)
    rec = pack_records(proj)[:, order]
    return rec, order
