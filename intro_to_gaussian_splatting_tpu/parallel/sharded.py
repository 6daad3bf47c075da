"""Multi-chip rendering and training via shard_map.

Decomposition (SURVEY.md section 5 "long-context" row -- the splatting
analogue of sequence parallelism):

  * Gaussians are sharded over the "gauss" mesh axis. Each device projects
    its shard (EWA + SH, perfectly parallel), packs records, and
    ``all_gather``s them along "gauss" -- 64 bytes/gaussian, the analogue of
    an activation all-gather. Reverse-mode AD transposes the all_gather into
    a reduce-scatter of record gradients back to shard owners, so parameter
    gradients never need a separate all-reduce.
  * Image tile rows are sharded over ALL devices (axes ("gauss", "tiles")
    combined): every device rasterizes its own strip of tiles against the
    gathered records with the same Pallas kernel used on one chip.
  * The scalar loss is a masked psum over both axes; everything downstream
    (optimizer update on sharded params) stays element-wise sharded.

Caveats vs the single-chip path: SSIM windows do not cross strip
boundaries (strip-local SSIM); densification runs on globally-sharded
arrays under jit (XLA inserts gathers for the argsorts).
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
from intro_to_gaussian_splatting_tpu.ops.binning import bin_gaussians, tile_grid
from intro_to_gaussian_splatting_tpu.ops.projection import project_gaussians
from intro_to_gaussian_splatting_tpu.ops.rasterize_pallas import (
    _interpret_default,
    rasterize_pairs,
    untile,
)
from intro_to_gaussian_splatting_tpu.parallel.mesh import GAUSS_AXIS, TILE_AXIS
from intro_to_gaussian_splatting_tpu.train.loss import rgb_loss

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


def _render_strip(model_shard: GaussianModel, camera: Camera,
                  rcfg: RasterizerConfig, strip_rows: int,
                  active_sh_degree: Optional[int], interpret: bool):
    """Runs INSIDE shard_map: project local shard, gather records, rasterize
    this device's tile strip. Returns (strip_rows, W, 8) raw channels."""
    w = camera.width
    ts = rcfg.tile_size
    ntx, nty_local = tile_grid(w, strip_rows, ts)

    proj = project_gaussians(model_shard, camera, rcfg, active_sh_degree)
    proj_full = jax.tree.map(
        lambda x: jax.lax.all_gather(x, GAUSS_AXIS, axis=0, tiled=True), proj)

    # shift into this strip's pixel coordinates
    row0 = (_strip_index() * strip_rows).astype(jnp.float32)
    mean2d = proj_full.mean2d - jnp.stack(
        [jnp.zeros_like(row0), row0])[None, :]
    proj_strip = dataclasses.replace(proj_full, mean2d=mean2d)

    bins = bin_gaussians(proj_strip, w, strip_rows, rcfg)
    num_groups = -(-(ntx * nty_local) // rcfg.group_tiles)
    tile_out = rasterize_pairs(
        bins.pair_records, bins.group_starts, num_groups, rcfg, interpret)
    return untile(tile_out, ntx, nty_local, ts, strip_rows, w)


@functools.partial(
    jax.jit,
    static_argnames=("rcfg", "active_sh_degree", "interpret", "mesh"))
def sharded_render(
    model: GaussianModel,
    camera: Camera,
    mesh: Mesh,
    rcfg: RasterizerConfig = RasterizerConfig(),
    active_sh_degree: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Multi-device render -> (H, W, 3) on the host mesh."""
    if interpret is None:
        interpret = _interpret_default()
    n_strips = mesh.shape[GAUSS_AXIS] * mesh.shape[TILE_AXIS]
    strip_rows, padded_h = strip_layout(camera.height, rcfg.tile_size, n_strips)

    def f(model_shard, cam):
        return _render_strip(model_shard, cam, rcfg, strip_rows,
                             active_sh_degree, interpret)

    out = shard_map(
        f, mesh=mesh,
        in_specs=(PS(GAUSS_AXIS), PS()),
        out_specs=PS((GAUSS_AXIS, TILE_AXIS)),
        check_vma=False,  # pallas_call does not declare varying-mesh axes
    )(model, camera)
    return out[:camera.height, :, :3]


def sharded_loss_fn(model_template: GaussianModel, camera: Camera, mesh: Mesh,
                    rcfg: RasterizerConfig, ssim_weight: float,
                    active_sh_degree: Optional[int], interpret: bool,
                    height: int):
    """Builds loss(params, target_padded) -> replicated scalar."""
    n_strips = mesh.shape[GAUSS_AXIS] * mesh.shape[TILE_AXIS]
    strip_rows, padded_h = strip_layout(height, rcfg.tile_size, n_strips)

    def inner(params_shard, active_shard, target_strip, cam):
        model_shard = model_template.replace(active=active_shard,
                                             **params_shard)
        strip = _render_strip(model_shard, cam, rcfg, strip_rows,
                              active_sh_degree, interpret)[..., :3]
        # mask rows beyond the true image height
        row0 = _strip_index() * strip_rows
        rows = jax.lax.broadcasted_iota(jnp.int32, (strip_rows, 1, 1), 0) + row0
        mask = (rows < height).astype(strip.dtype)
        strip = strip * mask
        target_strip = target_strip * mask
        if ssim_weight > 0.0:
            local = rgb_loss(strip, target_strip, ssim_weight)
            local_n = jnp.float32(1.0)
        else:
            local = jnp.sum(jnp.abs(strip - target_strip))
            # mask is (strip_rows, 1, 1): count = rows * W * channels
            local_n = jnp.sum(mask) * strip.shape[1] * 3.0
        num = jax.lax.psum(jax.lax.psum(local, GAUSS_AXIS), TILE_AXIS)
        den = jax.lax.psum(jax.lax.psum(local_n, GAUSS_AXIS), TILE_AXIS)
        return num / den

    f = shard_map(
        inner, mesh=mesh,
        in_specs=(PS(GAUSS_AXIS), PS(GAUSS_AXIS),
                  PS((GAUSS_AXIS, TILE_AXIS)), PS()),
        out_specs=PS(),
        check_vma=False,  # pallas_call does not declare varying-mesh axes
    )

    def loss(params, target_padded):
        return f(params, model_template.active, target_padded, camera)

    return loss, padded_h


@functools.partial(
    jax.jit,
    static_argnames=("rcfg", "tcfg", "tx", "mesh", "active_sh_degree",
                     "interpret"))
def sharded_train_step(
    model: GaussianModel,
    opt_state,
    camera: Camera,
    target_padded: jax.Array,
    mesh: Mesh,
    rcfg: RasterizerConfig,
    tcfg: TrainConfig,
    tx,
    active_sh_degree: int = 0,
    interpret: Optional[bool] = None,
):
    """One sharded optimization step. target_padded: (padded_H, W, 3) laid
    out with PS((gauss, tiles)) row sharding."""
    if interpret is None:
        interpret = _interpret_default()
    loss_fn, _ = sharded_loss_fn(
        model, camera, mesh, rcfg, tcfg.ssim_weight, active_sh_degree,
        interpret, camera.height)
    params = model.params()
    loss, grads = jax.value_and_grad(loss_fn)(params, target_padded)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    new_model = model.replace(**jax.tree.map(
        lambda new, old: jnp.where(
            model.active.reshape((-1,) + (1,) * (new.ndim - 1)), new, old),
        params, model.params()))
    return new_model, opt_state, loss
