"""Geometry pass: 3D gaussians -> screen-space splat records.

Re-implements the reference's ``GaussianScene.preprocess``
(splat/gaussian_scene.py:70-144) as one pure, jit-able, fully differentiable
function over struct-of-array pytrees. Steps (same math, batched):

  1. frustum cull: camera-space z >= min_z            (ref utils.py:293-310)
  2. Sigma_3d = (R S)(R S)^T                          (ref gaussians.py:54-69)
  3. NDC projection + ndc2Pix                         (ref gaussian_scene.py:87-97)
  4. EWA 2D covariance (J W Sigma W^T J^T)[:2,:2]     (ref utils.py:320-354)
  5. closed-form 2x2 inverse ("conic")                (ref utils.py:368-393)
  6. 3-sigma screen radius via eigenvalues            (ref utils.py:409-423)
  7. color: raw RGB (reference) or SH eval (3DGS)

Instead of boolean-mask compaction (dynamic shapes, ref :76-78), culled
gaussians keep their slots and carry ``valid=False`` -- the shapes stay static
for XLA; the binning pass drops them.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from intro_to_gaussian_splatting_tpu.config import RasterizerConfig
from intro_to_gaussian_splatting_tpu.models.camera import Camera
from intro_to_gaussian_splatting_tpu.models.gaussians import (
    GaussianModel,
    covariance_3d_channels,
)
from intro_to_gaussian_splatting_tpu.models.sh import eval_sh

# Feature-row indices of the packed splat record matrix (see pack_records).
# Geometry rows first; the differentiable "payload" rows [r, g, b, depth, 1]
# are contiguous at the end so the rasterizer accumulates color, expected
# depth, and alpha with a single (pixels, G) @ payload^T matmul.
REC_MEAN_X = 0
REC_MEAN_Y = 1
REC_CONIC_A = 2   # inverse-covariance [0,0]
REC_CONIC_B = 3   # inverse-covariance [0,1]
REC_CONIC_C = 4   # inverse-covariance [1,1]
REC_OPACITY = 5
REC_MIN_X = 6
REC_MAX_X = 7
REC_MIN_Y = 8
REC_MAX_Y = 9
REC_TILE = 10    # pair's tile id (binning fills it; f32-exact below 2^24)
REC_COLOR_R = 11
REC_COLOR_G = 12
REC_COLOR_B = 13
REC_DEPTH = 14
REC_ONE = 15
PAYLOAD_START = 11     # rows 11..15 = [r, g, b, depth, 1]
NUM_PAYLOAD = 5
NUM_REC_ROWS = 16  # a multiple of 8 (f32 sublane tile)
# The rasterizer consumes records FEATURE-MAJOR, (NUM_REC_ROWS, MAX_PAIRS):
# f32 arrays tile as (8, 128), so this layout is dense in HBM, whereas a
# pair-major (MAX_PAIRS, 16) layout would pad every row to 128 lanes (8x
# wasted footprint and stream bandwidth).


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ProjectedGaussians:
    """Per-gaussian screen-space quantities, slot-aligned with the model."""

    mean2d: jax.Array    # (N, 2) pixel coords
    depth: jax.Array     # (N,) camera-space z
    conic: jax.Array     # (N, 3) [a, b, c] of the 2x2 inverse covariance
    radius: jax.Array    # (N,) screen-space radius, pixels (0 when invalid)
    color: jax.Array     # (N, 3)
    opacity: jax.Array   # (N,)
    valid: jax.Array     # (N,) bool


def ndc2pix(v: jax.Array, dim: int) -> jax.Array:
    """ref: splat/utils.py:313-317."""
    return (v + 1.0) * (dim - 1) * 0.5


def project_gaussians(
    model: GaussianModel,
    camera: Camera,
    config: RasterizerConfig = RasterizerConfig(),
    active_sh_degree: int | None = None,
    mean2d_offset: jax.Array | None = None,
) -> ProjectedGaussians:
    f32 = jnp.float32
    means = model.means.astype(f32)
    mx, my, mz = means[:, 0], means[:, 1], means[:, 2]

    # All geometry below is struct-of-arrays: per-gaussian 4x4/3x3/2x3
    # matmuls put 2-4-wide minor dims onto 128-wide TPU lanes (32x register
    # padding, ~0.6 ms per batched dot_general at 52k gaussians); expanding
    # against the CONSTANT camera matrices makes the whole geometry pass one
    # fused elementwise kernel, forward and transposed.
    w2v = camera.world2view.astype(f32)                     # (4, 4) constant

    def affine(m, col):                                     # row-vector p @ M
        return mx * m[0, col] + my * m[1, col] + mz * m[2, col] + m[3, col]

    xv = affine(w2v, 0)
    yv = affine(w2v, 1)
    depth = affine(w2v, 2)                                  # camera-space z
    in_frustum = depth >= config.frustum_min_z              # ref utils.py:294

    # --- NDC -> pixel centers (ref gaussian_scene.py:87-97)
    fp = camera.full_proj.astype(f32)
    w = affine(fp, 3)
    w_safe = jnp.where(jnp.abs(w) < 1e-8, 1e-8, w)
    mean2d = jnp.stack(
        [ndc2pix(affine(fp, 0) / w_safe, camera.width),
         ndc2pix(affine(fp, 1) / w_safe, camera.height)],
        axis=1,
    )
    if mean2d_offset is not None:
        # zero-valued probe: grad w.r.t. it == screen-space positional
        # gradient, the 3DGS densification criterion (train/densify.py)
        mean2d = mean2d + mean2d_offset

    # --- EWA 2D covariance (ref utils.py:320-354)
    sxx, sxy, sxz, syy, syz, szz = covariance_3d_channels(
        model.log_scales.astype(f32), model.quats.astype(f32))
    z = depth
    z_safe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    limx = config.ewa_clamp * camera.tan_fovx
    limy = config.ewa_clamp * camera.tan_fovy
    x = jnp.clip(xv / z_safe, -limx, limx) * z
    y = jnp.clip(yv / z_safe, -limy, limy) * z
    fx, fy = camera.fx, camera.fy
    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z
    # M = J @ W with J = [[fx/z, 0, -fx*x/z^2], [0, fy/z, -fy*y/z^2]] and
    # W = w2v[:3,:3].T (ref utils.py:344-352): W rows are constants, so the
    # six M elements are elementwise combinations.
    j00, j02 = fx * inv_z, -fx * x * inv_z2
    j11, j12 = fy * inv_z, -fy * y * inv_z2
    m = [[j00 * w2v[k, 0] + j02 * w2v[k, 2] for k in range(3)],
         [j11 * w2v[k, 1] + j12 * w2v[k, 2] for k in range(3)]]

    def quad(u, v):                                         # u . Sigma3d . v
        return (u[0] * v[0] * sxx + u[1] * v[1] * syy + u[2] * v[2] * szz
                + (u[0] * v[1] + u[1] * v[0]) * sxy
                + (u[0] * v[2] + u[2] * v[0]) * sxz
                + (u[1] * v[2] + u[2] * v[1]) * syz)

    a = quad(m[0], m[0]) + config.cov2d_dilation
    b = quad(m[0], m[1])
    c = quad(m[1], m[1]) + config.cov2d_dilation

    # --- conic = closed-form inverse with det clamp (ref utils.py:368-393)
    det = a * c - b * b
    det_clamped = jnp.maximum(det, config.det_clamp)
    conic = jnp.stack([c, -b, a], axis=1) / det_clamped[:, None]

    # --- 3-sigma radius via eigenvalues (ref utils.py:409-423)
    mid = 0.5 * (a + c)
    disc = jnp.maximum(mid * mid - det, config.eig_floor)
    lam_max = mid + jnp.sqrt(disc)
    radius = jnp.ceil(config.radius_sigmas * jnp.sqrt(jnp.maximum(lam_max, 0.0)))

    # --- color
    if model.color_space == "rgb":
        color = model.sh[:, 0, :].astype(f32)
    else:
        deg = model.sh_degree if active_sh_degree is None else active_sh_degree
        dirs = means - camera.cam_center.astype(f32)
        dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=1, keepdims=True), 1e-8)
        color = eval_sh(model.sh.astype(f32), dirs, deg)

    # --- opacity activation (ref gaussian_scene.py:143; double-sigmoid quirk :164)
    opacity = jax.nn.sigmoid(model.opacity_logits.astype(f32))
    if config.compat.double_sigmoid:
        opacity = jax.nn.sigmoid(opacity)

    valid = in_frustum & model.active & (radius > 0)
    # zero-out radius of invalid slots so binning emits no pairs for them
    radius = jnp.where(valid, radius, 0.0)

    return ProjectedGaussians(
        mean2d=mean2d, depth=depth, conic=conic, radius=radius,
        color=color, opacity=opacity, valid=valid,
    )


def pack_records(proj: ProjectedGaussians) -> jax.Array:
    """Pack the projection outputs into the (NUM_REC_ROWS, N) feature-major
    record matrix consumed by the rasterizer backends.

    Feature-major (features on sublanes, gaussians on lanes) so that a chunk
    of G gaussians loads as a (16, G) VMEM block whose rows broadcast directly
    against (pixels, G) arrays.
    """
    radius = jax.lax.stop_gradient(proj.radius)
    mean2d_ng = jax.lax.stop_gradient(proj.mean2d)
    zeros = jnp.zeros_like(proj.depth)
    rows = [
        proj.mean2d[:, 0],
        proj.mean2d[:, 1],
        proj.conic[:, 0],
        proj.conic[:, 1],
        proj.conic[:, 2],
        proj.opacity,
        # bbox rows are integer-valued tests, not differentiable
        jnp.floor(mean2d_ng[:, 0] - radius),
        jnp.ceil(mean2d_ng[:, 0] + radius),
        jnp.floor(mean2d_ng[:, 1] - radius),
        jnp.ceil(mean2d_ng[:, 1] + radius),
        zeros,                       # spare row 10
        proj.color[:, 0],
        proj.color[:, 1],
        proj.color[:, 2],
        proj.depth,
        jnp.ones_like(proj.depth),   # alpha-accumulator payload row
    ]
    return jnp.stack(rows, axis=0)
