"""3DGS optimization loop: Adam + densify/prune from COLMAP init.

The reference never trains anything (its tensors request grad but no loss or
optimizer exists, SURVEY.md section 0 / splat/gaussians.py:19-22); this is
the standard 3DGS recipe on TPU: per-group Adam learning rates with an
exponentially decaying means schedule scaled by scene extent, (1-w)L1 +
w(1-SSIM) photometric loss, periodic clone/split/prune and opacity reset,
all with jit-compatible fixed-capacity state.
"""

from __future__ import annotations

import collections
import dataclasses
import functools
import json
import os
import time
from typing import Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from intro_to_gaussian_splatting_tpu.config import RasterizerConfig, TrainConfig
from intro_to_gaussian_splatting_tpu.models.camera import Camera
from intro_to_gaussian_splatting_tpu.models.gaussians import GaussianModel
from intro_to_gaussian_splatting_tpu.ops.rasterize_pallas import (
    image_to_tiles,
    render_tiled,
    render_tiles,
    tile_pixel_mask,
    untile_chw,
)
from intro_to_gaussian_splatting_tpu.ops.binning import tile_grid
from intro_to_gaussian_splatting_tpu.ops.ssim_pallas import fused_ssim
from intro_to_gaussian_splatting_tpu.train import densify as D
from intro_to_gaussian_splatting_tpu.train.loss import (
    psnr, rgb_loss, tile_l1, tile_psnr,
)


def _scale_by_sh_lr(lr_sh0: float, lr_shN: float):
    """Descent scaling for the SH leaf: coefficient 0 (DC color) steps at
    lr_sh0, the rest-band coefficients at lr_shN (3DGS trains rest at /20).

    Adam normalizes per-element, so chaining this after ``scale_by_adam``
    is exactly equivalent to two Adam groups with different learning rates.
    """
    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params

        def f(u):
            k = u.shape[1]
            scale = jnp.full((k,), -lr_shN, u.dtype).at[0].set(-lr_sh0)
            return u * scale[None, :, None]

        return jax.tree.map(f, updates), state

    return optax.GradientTransformation(init, update)


def make_optimizer(config: TrainConfig, scene_extent: float):
    """Per-parameter-group Adam, 3DGS learning rates."""
    means_schedule = optax.exponential_decay(
        init_value=config.lr_means * scene_extent,
        transition_steps=config.iterations,
        decay_rate=config.lr_means_final / config.lr_means,
    )
    txs = {
        "means": optax.adam(means_schedule, b1=0.9, b2=0.999, eps=1e-15),
        "log_scales": optax.adam(config.lr_scales, eps=1e-15),
        "quats": optax.adam(config.lr_quats, eps=1e-15),
        "opacity_logits": optax.adam(config.lr_opacity, eps=1e-15),
        # split effective LR inside one leaf: DC at lr_sh0, rest at lr_shN
        "sh": optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-15),
            _scale_by_sh_lr(config.lr_sh0, config.lr_shN),
        ),
    }
    return optax.multi_transform(txs, param_labels={k: k for k in txs})


def _camera_loss(model, params, probe, camera, target_tiles, target_mask,
                 target_image, rcfg, tcfg, active_sh_degree):
    """Photometric objective of ONE camera -> (loss, (tiles, aux, mse)).

    Fused path (tcfg.fused_loss and ssim_weight > 0): target_image is the
    padded channel-major target of fused_loss_pallas.pad_target_chw and
    target_tiles/target_mask are None; L1 + SSIM value AND gradient (plus
    the MSE metrics tap) run as one tile-space Pallas band pass. Split
    path: tile-space L1 against target_tiles/target_mask, SSIM (if on)
    through the untile relayout against the (3, H, W) target_image;
    ``mse`` is then None and the caller derives PSNR from tile_psnr.
    """
    h, w = camera.height, camera.width
    ts = rcfg.tile_size
    ntx, nty = tile_grid(w, h, ts)
    fused = tcfg.ssim_weight > 0.0 and tcfg.fused_loss
    m = model.replace(**params)
    tiles, aux = render_tiles(m, camera, rcfg,
                              active_sh_degree=active_sh_degree,
                              return_aux=True, mean2d_offset=probe)
    if fused:
        from intro_to_gaussian_splatting_tpu.ops.fused_loss_pallas import (
            fused_photometric_loss,
        )
        loss, mse = fused_photometric_loss(
            tiles[:, :3], target_image, ntx, nty, ts, h, w,
            tcfg.ssim_weight, None)
        return loss, (tiles, aux, jax.lax.stop_gradient(mse))
    loss = tile_l1(tiles, target_tiles, target_mask)
    if tcfg.ssim_weight > 0.0:
        from intro_to_gaussian_splatting_tpu.ops.rasterize_pallas import (
            _interpret_default,
        )
        if _interpret_default():
            img = untile_chw(tiles[:, :3], ntx, nty, ts, h, w)
        else:
            # Pallas relayout: same permutation, ~5x cheaper fwd+bwd
            # than the XLA untile at treehill scale (relayout_pallas)
            from intro_to_gaussian_splatting_tpu.ops.relayout_pallas import (
                untile_chw_fast,
            )
            img = untile_chw_fast(tiles[:, :4], ntx, nty, ts, h, w, False)
        loss = ((1.0 - tcfg.ssim_weight) * loss
                + tcfg.ssim_weight
                * (1.0 - fused_ssim(img, target_image, grad_target=False)))
    return loss, (tiles, aux, None)


@functools.partial(jax.jit, static_argnames=("rcfg", "tcfg", "tx",
                                              "active_sh_degree"))
def train_step(
    model: GaussianModel,
    opt_state,
    dstate: D.DensifyState,
    camera: Camera,
    target_tiles: jax.Array,
    target_mask: jax.Array,
    target_image: Optional[jax.Array],
    rcfg: RasterizerConfig,
    tcfg: TrainConfig,
    tx,
    active_sh_degree: int = 0,
):
    """One optimization step on one camera in the rasterizer's NATIVE tile
    layout. Returns (model, opt_state, dstate, metrics).

    With ``tcfg.fused_loss`` and ssim_weight > 0 (the production path),
    ``target_image`` is the padded channel-major target from
    ``fused_loss_pallas.pad_target_chw`` and target_tiles/target_mask are
    None: the whole photometric objective (L1 + SSIM, value AND pixel
    gradient, plus the MSE metrics tap) runs as ONE Pallas band pass in
    tile space -- no tile<->image relayout ever touches HBM. Otherwise
    ``target_tiles``/``target_mask`` come from ``image_to_tiles`` /
    ``tile_pixel_mask`` and the split path runs (tile-space L1; for
    ssim_weight > 0 the SSIM term untiles the RGB channels and
    ``target_image`` must be the (3, H, W) ground truth).
    """
    params = model.params()
    probe = jnp.zeros((model.capacity, 2), jnp.float32)
    fused = tcfg.ssim_weight > 0.0 and tcfg.fused_loss

    def loss_fn(params, probe):
        return _camera_loss(model, params, probe, camera, target_tiles,
                            target_mask, target_image, rcfg, tcfg,
                            active_sh_degree)

    (loss, (tiles, aux, mse)), grads = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(params, probe)
    param_grads, screen_grads = grads

    updates, opt_state = tx.update(param_grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    # dead slots must not drift
    new_model = model.replace(**jax.tree.map(
        lambda new, old: jnp.where(
            model.active.reshape((-1,) + (1,) * (new.ndim - 1)), new, old),
        params, model.params()))

    dstate = D.accumulate(dstate, screen_grads, aux["visible"])
    if fused:
        psnr_val = -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
    else:
        psnr_val = tile_psnr(tiles, target_tiles, target_mask)
    metrics = dict(loss=loss,
                   psnr=psnr_val,
                   num_active=model.num_active,
                   overflowed=aux["overflowed"])
    return new_model, opt_state, dstate, metrics


@functools.partial(jax.jit, static_argnames=("rcfg", "tcfg", "tx",
                                              "active_sh_degree"))
def train_step_batched(
    model: GaussianModel,
    opt_state,
    dstate: D.DensifyState,
    cameras: Camera,
    target_tiles: Optional[jax.Array],
    target_mask: Optional[jax.Array],
    target_images: Optional[jax.Array],
    rcfg: RasterizerConfig,
    tcfg: TrainConfig,
    tx,
    active_sh_degree: int = 0,
):
    """Multi-camera batch DP: ONE optimizer step on the MEAN gradient over
    B stacked same-resolution cameras (SURVEY.md section 2.3 row
    "everything else" -- the reference's only parallelism is its CUDA
    launch grid, splat/c/render.cu:119-124).

    ``cameras`` is a stacked Camera pytree (models/camera.stack_cameras);
    targets carry a leading B dim in whichever layout the loss path needs
    (see _camera_loss). A ``lax.scan`` renders and differentiates each
    camera in sequence ON DEVICE -- B renders per host dispatch -- while
    the densify statistics accumulate per camera exactly as B sequential
    steps would. Equivalent to train_step on the averaged gradient
    (tested: batched == mean of per-camera grads).
    """
    params = model.params()
    probe = jnp.zeros((model.capacity, 2), jnp.float32)
    b = cameras.world2view.shape[0]

    def body(carry, xs):
        gacc, dstate, lacc, pacc, oacc = carry
        cam, tt, tm, ti = xs

        def loss_fn(params, probe):
            return _camera_loss(model, params, probe, cam, tt, tm, ti,
                                rcfg, tcfg, active_sh_degree)

        (loss, (tiles, aux, mse)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, probe)
        pg, sg = grads
        if mse is not None:
            psnr_val = -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
        else:
            psnr_val = tile_psnr(tiles, tt, tm)
        gacc = jax.tree.map(jnp.add, gacc, pg)
        dstate = D.accumulate(dstate, sg, aux["visible"])
        return (gacc, dstate, lacc + loss, pacc + psnr_val,
                oacc | aux["overflowed"]), None

    init = (jax.tree.map(jnp.zeros_like, params), dstate,
            jnp.zeros(()), jnp.zeros(()), jnp.zeros((), bool))
    xs = (cameras, target_tiles, target_mask, target_images)
    (gacc, dstate, lacc, pacc, oacc), _ = jax.lax.scan(
        body, init, xs, length=b)

    mean_grads = jax.tree.map(lambda g: g / b, gacc)
    updates, opt_state = tx.update(mean_grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    new_model = model.replace(**jax.tree.map(
        lambda new, old: jnp.where(
            model.active.reshape((-1,) + (1,) * (new.ndim - 1)), new, old),
        params, model.params()))
    metrics = dict(loss=lacc / b, psnr=pacc / b,
                   num_active=model.num_active, overflowed=oacc)
    return new_model, opt_state, dstate, metrics


@functools.partial(jax.jit,
                   static_argnames=("tcfg", "scene_extent", "max_new"))
def _densify_jit(model, dstate, key, tcfg, scene_extent, max_new):
    return D.densify(model, dstate, key, tcfg, scene_extent, max_new)


@functools.partial(jax.jit, static_argnames=("tcfg", "scene_extent"))
def _prune_jit(model, tcfg, scene_extent):
    return D.prune(model, tcfg, scene_extent)


@functools.partial(jax.jit, static_argnames=("capacity",))
def _zero_slots_jit(tree, slots, capacity):
    return D.zero_slots(tree, slots, capacity)


@jax.jit
def _acc_overflow_jit(count, overflowed):
    """Running count of steps whose pair pool truncated (device-side)."""
    return count + jnp.asarray(overflowed).astype(jnp.int32)


@dataclasses.dataclass
class Trainer:
    """Drives the loop; holds host-side state (step counter, RNG).

    With ``mesh`` set, every step runs ``parallel.sharded.sharded_train_step``
    over the gauss x tiles device mesh (gaussians sharded, tile strips
    sharded, ppermute ring streaming) -- including in multi-process
    (multi-host) runs, where the mesh spans every process's devices and the
    model/optimizer/targets are globally sharded arrays. Densify/prune run
    under jit on the sharded arrays. The single-device tile-space fast path
    is unchanged when ``mesh`` is None.
    """

    model: GaussianModel
    cameras: list            # list[Camera]
    targets: list            # list[np.ndarray (H, W, 3)]
    scene_extent: float
    rcfg: RasterizerConfig = RasterizerConfig()
    tcfg: TrainConfig = TrainConfig()
    log_every: int = 50
    on_log: Optional[Callable] = None
    mesh: Optional[object] = None      # jax.sharding.Mesh
    ring: bool = True
    # failure recovery: with checkpoint_dir set and tcfg.checkpoint_every>0,
    # the full state (model + optimizer + step) is saved periodically and
    # resume() restores the newest one (multihost story:
    # parallel/multihost.py -- restart all processes, resume, continue)
    checkpoint_dir: Optional[str] = None
    # machine-readable training-run artifact: one JSON object per logged
    # metrics row (SURVEY.md section 5 "stdout/JSONL" plan row)
    jsonl_path: Optional[str] = None
    # device-memory budget for cached pre-tiled targets; LRU-evicted beyond
    # it (a 180-camera Mip-NeRF scene at treehill scale would otherwise pin
    # ~36 GB of targets on a 16 GB chip). Re-tiling on a miss is one cheap
    # relayout of the host-resident numpy target.
    target_cache_bytes: int = 4 << 30

    def __post_init__(self):
        self.tx = make_optimizer(self.tcfg, self.scene_extent)
        if self.mesh is not None:
            self._setup_sharded()
        self.opt_state = jax.jit(self.tx.init)(self.model.params())
        self.dstate = self._dstate_zero()
        self.key = jax.random.PRNGKey(self.tcfg.seed)
        self.step = 0
        self.history = []
        # cam_idx -> (entry, nbytes); LRU order, bounded by
        # target_cache_bytes (entry is (tiles, img|None) single-device or
        # the padded sharded target)
        self._tiled = collections.OrderedDict()
        self._tiled_bytes = 0
        self._masks = {}     # (H, W) -> tile_pixel_mask
        # on-device overflow accounting: incremented every step a pair pool
        # truncated, fetched (tunnel-safely) only at log/densify boundaries
        self._overflow_count = jnp.zeros((), jnp.int32)
        self._overflow_seen = 0      # host-side count at last boundary

    # ---- sharded-mode plumbing -----------------------------------------
    def _setup_sharded(self):
        from jax.sharding import NamedSharding, PartitionSpec as PS

        from intro_to_gaussian_splatting_tpu.parallel.mesh import GAUSS_AXIS
        from intro_to_gaussian_splatting_tpu.parallel.multihost import (
            put_global_tree,
        )
        g = self.mesh.shape[GAUSS_AXIS]
        assert self.model.capacity % g == 0, \
            f"capacity {self.model.capacity} not divisible by gauss axis {g}"
        if jax.process_count() > 1:
            self.model = put_global_tree(self.model, self.mesh,
                                         PS(GAUSS_AXIS))
            self.cameras = [put_global_tree(c, self.mesh, PS())
                            for c in self.cameras]
        else:
            self.model = jax.tree.map(
                lambda x: jax.device_put(
                    x, NamedSharding(self.mesh, PS(GAUSS_AXIS))), self.model)

    def _dstate_zero(self):
        z = D.DensifyState.zero(self.model.capacity)
        if self.mesh is None:
            return z
        from jax.sharding import PartitionSpec as PS
        from intro_to_gaussian_splatting_tpu.parallel.mesh import GAUSS_AXIS
        from intro_to_gaussian_splatting_tpu.parallel.multihost import (
            put_global_tree,
        )
        return put_global_tree(z, self.mesh, PS(GAUSS_AXIS))

    # ---- bounded target cache ------------------------------------------
    def _cache_get(self, cam_idx: int):
        if cam_idx not in self._tiled:
            return None
        self._tiled.move_to_end(cam_idx)
        return self._tiled[cam_idx][0]

    def _cache_put(self, cam_idx: int, entry, nbytes: int):
        self._tiled[cam_idx] = (entry, nbytes)
        self._tiled_bytes += nbytes
        while (self._tiled_bytes > self.target_cache_bytes
               and len(self._tiled) > 1):
            old_key, (_, old_bytes) = self._tiled.popitem(last=False)
            if old_key == cam_idx:      # never evict the entry just added
                self._tiled[old_key] = (entry, nbytes)
                break
            self._tiled_bytes -= old_bytes
        return entry

    @staticmethod
    def _entry_nbytes(entry) -> int:
        return sum(getattr(leaf, "nbytes", 0)
                   for leaf in jax.tree.leaves(entry))

    def _sharded_target_for(self, cam_idx: int):
        """(padded_H, W, 3) target with PS((gauss, tiles)) row sharding;
        multi-process hosts contribute only their own strip rows."""
        hit = self._cache_get(cam_idx)
        if hit is not None:
            return hit
        from jax.sharding import NamedSharding, PartitionSpec as PS

        from intro_to_gaussian_splatting_tpu.parallel.mesh import (
            GAUSS_AXIS, TILE_AXIS,
        )
        from intro_to_gaussian_splatting_tpu.parallel.sharded import (
            strip_layout,
        )
        cam = self.cameras[cam_idx]
        height = int(cam.height)    # static pytree metadata (camera.py)
        n_strips = (self.mesh.shape[GAUSS_AXIS]
                    * self.mesh.shape[TILE_AXIS])
        _, padded_h = strip_layout(height, self.rcfg.tile_size, n_strips)
        target = np.asarray(self.targets[cam_idx], np.float32)
        pad = np.zeros((padded_h,) + target.shape[1:], np.float32)
        pad[:target.shape[0]] = target
        if jax.process_count() > 1:
            from intro_to_gaussian_splatting_tpu.parallel.multihost import (
                globalize_target, process_local_rows,
            )
            row0, rows = process_local_rows(height, self.rcfg.tile_size,
                                            self.mesh)
            out = globalize_target(pad[row0:row0 + rows], padded_h,
                                   self.mesh)
        else:
            out = jax.device_put(
                pad, NamedSharding(self.mesh, PS((GAUSS_AXIS, TILE_AXIS))))
        return self._cache_put(cam_idx, out, self._entry_nbytes(out))

    def _target_for(self, cam_idx: int):
        """Per-camera target in the layout the loss path needs, LRU-cached.

        Fused path (ssim_weight > 0 and tcfg.fused_loss): ONLY the padded
        channel-major image of fused_loss_pallas (the kernel computes L1,
        SSIM and the PSNR tap itself) -- about half the device bytes of the
        split path's (tiles, image) pair. Split path: pre-tiled target +
        pixel mask (+ channel-major image when SSIM is on).
        """
        cam = self.cameras[cam_idx]
        h, w = cam.height, cam.width
        fused = self.tcfg.ssim_weight > 0.0 and self.tcfg.fused_loss
        entry = self._cache_get(cam_idx)
        if entry is None:
            target = self.targets[cam_idx]
            if not isinstance(target, jnp.ndarray):
                target = jnp.asarray(target, dtype=jnp.float32)
            if fused:
                from intro_to_gaussian_splatting_tpu.ops.fused_loss_pallas \
                    import pad_target_chw
                ntx, nty = tile_grid(w, h, self.rcfg.tile_size)
                pad = jax.jit(pad_target_chw, static_argnums=(1, 2, 3, 4,
                                                              5))(
                    target, ntx, nty, self.rcfg.tile_size, h, w)
                entry = (None, pad)
            else:
                tiles = image_to_tiles(target, self.rcfg)
                img = (target.transpose(2, 0, 1)
                       if self.tcfg.ssim_weight > 0.0 else None)
                entry = (tiles, img)
            self._cache_put(cam_idx, entry, self._entry_nbytes(entry))
        tiles, img = entry
        if fused:
            return None, None, img
        hw = (h, w)
        if hw not in self._masks:
            self._masks[hw] = tile_pixel_mask(*hw, self.rcfg)
        return tiles, self._masks[hw], img

    @property
    def active_sh_degree(self) -> int:
        if self.model.color_space != "sh":
            return 0
        return min(self.model.sh_degree,
                   self.step // self.tcfg.sh_degree_interval)

    def _batched_target_for(self, group):
        """Stacked cameras + targets for one fixed camera group (cached)."""
        from intro_to_gaussian_splatting_tpu.models.camera import (
            stack_cameras,
        )
        key = ("batch",) + tuple(group)
        entry = self._cache_get(key)
        if entry is None:
            fused = self.tcfg.ssim_weight > 0.0 and self.tcfg.fused_loss
            cams = stack_cameras([self.cameras[i] for i in group])
            h, w = cams.height, cams.width

            def tgt(i):
                t = self.targets[i]
                return (t if isinstance(t, jnp.ndarray)
                        else jnp.asarray(t, jnp.float32))

            if fused:
                from intro_to_gaussian_splatting_tpu.ops.fused_loss_pallas \
                    import pad_target_chw
                ntx, nty = tile_grid(w, h, self.rcfg.tile_size)
                pad = jax.jit(pad_target_chw,
                              static_argnums=(1, 2, 3, 4, 5))
                ti = jnp.stack([pad(tgt(i), ntx, nty, self.rcfg.tile_size,
                                    h, w) for i in group])
                entry = (cams, None, None, ti)
            else:
                tiles = jnp.stack([image_to_tiles(tgt(i), self.rcfg)
                                   for i in group])
                mask = tile_pixel_mask(h, w, self.rcfg)
                masks = jnp.stack([mask] * len(group))
                imgs = (jnp.stack([tgt(i).transpose(2, 0, 1)
                                   for i in group])
                        if self.tcfg.ssim_weight > 0.0 else None)
                entry = (cams, tiles, masks, imgs)
            self._cache_put(key, entry, self._entry_nbytes(entry))
        return entry

    def run(self, iterations: Optional[int] = None):
        iterations = iterations or self.tcfg.iterations
        bsz = self.tcfg.camera_batch
        batched = self.mesh is None and bsz > 1
        n_units = (max(1, -(-len(self.cameras) // bsz)) if batched
                   else len(self.cameras))
        order = np.random.default_rng(self.tcfg.seed).permutation(
            np.arange(iterations) % n_units)
        t0 = time.time()
        for it in range(iterations):
            cam_idx = int(order[it])
            if self.mesh is not None:
                from intro_to_gaussian_splatting_tpu.parallel.sharded import (
                    sharded_train_step,
                )
                target_padded = self._sharded_target_for(cam_idx)
                self.model, self.opt_state, self.dstate, metrics = \
                    sharded_train_step(
                        self.model, self.opt_state, self.dstate,
                        self.cameras[cam_idx], target_padded, self.mesh,
                        self.rcfg, self.tcfg, self.tx,
                        self.active_sh_degree, ring=self.ring)
            elif batched:
                group = tuple((cam_idx * bsz + k) % len(self.cameras)
                              for k in range(bsz))
                cams, tt, tm, ti = self._batched_target_for(group)
                self.model, self.opt_state, self.dstate, metrics = \
                    train_step_batched(
                        self.model, self.opt_state, self.dstate, cams,
                        tt, tm, ti, self.rcfg, self.tcfg, self.tx,
                        self.active_sh_degree)
            else:
                target_tiles, target_mask, target_image = \
                    self._target_for(cam_idx)
                self.model, self.opt_state, self.dstate, metrics = train_step(
                    self.model, self.opt_state, self.dstate,
                    self.cameras[cam_idx], target_tiles, target_mask,
                    target_image,
                    self.rcfg, self.tcfg, self.tx, self.active_sh_degree)
            self.step += 1
            # on-device accumulation: no per-step host fetch (a fetch would
            # serialize the async dispatch pipeline and block on tunneled
            # transports); the count is read back only at boundaries.
            # Multi-process runs skip it (a single-device counter cannot
            # mix with their global arrays) and report the logged step only.
            if jax.process_count() == 1:
                self._overflow_count = _acc_overflow_jit(
                    self._overflow_count, metrics["overflowed"])
            self._maybe_densify()
            self._maybe_checkpoint()
            if self.step % self.log_every == 0 or it == iterations - 1:
                m = dict(metrics)
                if jax.process_count() == 1:
                    m["overflow_steps"] = self._overflow_count
                m = self._fetch_metrics(m)
                # how many steps since the LAST boundary truncated their
                # pair pool (a mid-window overflow is visible here even if
                # the logged step itself did not overflow)
                if "overflow_steps" in m:
                    total = int(m.pop("overflow_steps"))
                    m["overflow_steps"] = total - self._overflow_seen
                    self._overflow_seen = total
                else:
                    m["overflow_steps"] = int(bool(m["overflowed"]))
                m.update(step=self.step, sec=round(time.time() - t0, 2))
                self.history.append(m)
                if self.jsonl_path:
                    with open(self.jsonl_path, "a") as f:
                        f.write(json.dumps(m) + "\n")
                if self.on_log:
                    self.on_log(m)
                if m["overflow_steps"] > 0:
                    self._grow_pair_pool()
        return self.history

    def _fetch_metrics(self, metrics: dict) -> dict:
        """Device metrics -> host floats, tunnel-safely: one fused fetch
        through the CPU-backend jit (utils/fetch.py -- a direct
        ``float(v)`` device->host transfer blocks forever on tunneled TPU
        transports). Multi-process runs keep the direct path: their
        replicated global arrays are not single-device CPU-jittable, and
        multihost deployments are not tunneled."""
        if jax.process_count() > 1:
            return {k: float(v) for k, v in metrics.items()}
        from intro_to_gaussian_splatting_tpu.utils.fetch import (
            host_fetch_scalars,
        )
        return host_fetch_scalars(metrics)

    def _maybe_checkpoint(self):
        """Periodic full-state save (model + optimizer moments + step)."""
        every = self.tcfg.checkpoint_every
        if not (every and self.checkpoint_dir and self.step % every == 0):
            return
        from intro_to_gaussian_splatting_tpu.train.checkpoint import (
            prune_checkpoints, save_checkpoint,
        )
        save_checkpoint(self.checkpoint_dir, self.model, self.opt_state,
                        self.step)
        if jax.process_index() == 0:
            prune_checkpoints(self.checkpoint_dir, self.tcfg.checkpoint_keep)
        if self.on_log:
            self.on_log(dict(step=self.step, event="checkpoint_saved",
                             dir=self.checkpoint_dir))

    def resume(self, path: Optional[str] = None,
               step: Optional[int] = None) -> int:
        """Restore model/optimizer/step from the newest (or given)
        checkpoint; returns the restored step. The Trainer must be built
        with the same scene/capacity as the run that saved it."""
        from intro_to_gaussian_splatting_tpu.train.checkpoint import (
            load_checkpoint,
        )
        path = path or self.checkpoint_dir
        assert path, "resume() needs a checkpoint path"
        self.model, self.opt_state, self.step = load_checkpoint(
            path, self.model, self.opt_state, step)
        if self.mesh is not None:
            # restored arrays are host-local; re-shard onto the mesh
            # (capacity-leading leaves along the gauss axis, scalars
            # replicated -- exactly the placement training produced)
            from jax.sharding import NamedSharding, PartitionSpec as PS
            from intro_to_gaussian_splatting_tpu.parallel.mesh import (
                GAUSS_AXIS,
            )
            from intro_to_gaussian_splatting_tpu.parallel.multihost import (
                put_global,
            )
            capacity = self.model.capacity

            def reshard(x):
                sharded = (getattr(x, "ndim", 0) >= 1
                           and x.shape[0] == capacity)
                spec = PS(GAUSS_AXIS) if sharded else PS()
                if jax.process_count() > 1:
                    return put_global(x, self.mesh, spec)
                return jax.device_put(x, NamedSharding(self.mesh, spec))

            self.model = jax.tree.map(reshard, self.model)
            self.opt_state = jax.tree.map(reshard, self.opt_state)
        return self.step

    def _grow_pair_pool(self):
        """Overflow response: the (tile, gaussian) pair pool dropped whole
        far gaussians this step (ops/binning.py drop policy). Double the
        static pool capacity so the drop is a transient, not a steady state;
        the next train_step call recompiles against the new capacity.
        Checked at log boundaries: a per-step device fetch would serialize
        the async dispatch pipeline (and block on some TPU transports)."""
        self.rcfg = dataclasses.replace(
            self.rcfg, pairs_per_gaussian=self.rcfg.pairs_per_gaussian * 2)
        if self.on_log:
            self.on_log(dict(step=self.step, event="pair_pool_grown",
                             pairs_per_gaussian=self.rcfg.pairs_per_gaussian))

    def _maybe_densify(self):
        t = self.tcfg
        if t.densify_start <= self.step <= t.densify_stop and \
                self.step % t.densify_interval == 0:
            # densification grows pair demand; check the overflow counter
            # here too so a truncating pool is grown at most one densify
            # interval after it starts dropping (not only at log boundaries)
            if jax.process_count() == 1:
                total = int(self._fetch_metrics(
                    dict(n=self._overflow_count))["n"])
                if total > self._overflow_seen:
                    self._overflow_seen = total
                    self._grow_pair_pool()
            self.key, sub = jax.random.split(self.key)
            max_new = max(self.model.capacity // 8, 1)
            # under jit so the ops run SPMD on globally-sharded arrays in
            # mesh/multi-process mode (eager ops on non-addressable arrays
            # are rejected by JAX); identical math single-device
            self.model, new_slots = _densify_jit(
                self.model, self.dstate, sub, t, self.scene_extent, max_new)
            self.model = _prune_jit(self.model, t, self.scene_extent)
            self.opt_state = _zero_slots_jit(
                self.opt_state, new_slots, self.model.capacity)
            self.dstate = self._dstate_zero()
        if t.opacity_reset_interval and \
                self.step % t.opacity_reset_interval == 0 and self.step > 0:
            self.model = jax.jit(D.reset_opacity)(self.model)


def scene_extent_of(points: np.ndarray) -> float:
    """Radius of the camera/point bounding sphere (3DGS uses camera extent;
    point extent is a serviceable stand-in)."""
    center = points.mean(axis=0)
    return float(np.linalg.norm(points - center, axis=1).max())


# ---------------------------------------------------------------------------
# CLI entry (gstpu train)
# ---------------------------------------------------------------------------

def train_cli(args) -> int:
    from intro_to_gaussian_splatting_tpu.cli import write_ppm
    from intro_to_gaussian_splatting_tpu.io.dataset import load_scene
    from intro_to_gaussian_splatting_tpu.models import init_from_points
    from intro_to_gaussian_splatting_tpu.train.checkpoint import (
        export_ply, save_checkpoint,
    )

    scene = load_scene(args.scene, downscale=args.downscale,
                       min_track=args.min_track)
    if not scene.targets:
        raise SystemExit(
            f"no ground-truth images found under {args.scene}/images")
    holdout_every = getattr(args, "holdout", 0) or 0
    train_scene, holdout_scene = scene.split_holdout(holdout_every)
    points = scene.points
    cams, targets = train_scene.cameras, train_scene.targets

    tcfg = TrainConfig(iterations=args.iterations)
    if getattr(args, "ssim_weight", None) is not None:
        tcfg = dataclasses.replace(tcfg, ssim_weight=args.ssim_weight)
    if getattr(args, "camera_batch", 1) and args.camera_batch > 1:
        tcfg = dataclasses.replace(tcfg, camera_batch=args.camera_batch)
    if getattr(args, "checkpoint_every", None):
        tcfg = dataclasses.replace(
            tcfg, checkpoint_every=args.checkpoint_every)

    # --multihost: train the SHARDED step over the global mesh spanning all
    # processes' devices (gauss x tiles, ppermute ring); capacity must be
    # divisible by the gauss axis
    mesh = None
    capacity = int(len(points) * tcfg.capacity_multiplier)
    if getattr(args, "multihost", False):
        from intro_to_gaussian_splatting_tpu.parallel.mesh import GAUSS_AXIS
        from intro_to_gaussian_splatting_tpu.parallel.multihost import (
            global_mesh,
        )
        mesh = global_mesh()
        g = mesh.shape[GAUSS_AXIS]
        capacity = -(-capacity // g) * g
        print(f"multihost: {jax.process_count()} processes, "
              f"mesh={dict(mesh.shape)}")

    model = init_from_points(
        points.xyz, points.rgb, sh_degree=tcfg.sh_degree, color_space="sh",
        capacity=capacity, opacity=0.1, scale_init=None)
    extent = scene_extent_of(points.xyz)

    def log(m):
        if "event" in m:
            print(f"step {m['step']}: {m['event']} ({m})")
            return
        print(f"step {m['step']}: loss {m['loss']:.4f} "
              f"psnr {m['psnr']:.2f} active {int(m['num_active'])}")

    os.makedirs(args.out_dir, exist_ok=True)
    ckpt_dir = os.path.join(args.out_dir, "ckpt")
    jsonl = (os.path.join(args.out_dir, "metrics.jsonl")
             if jax.process_index() == 0 else None)
    trainer = Trainer(model=model, cameras=cams, targets=targets,
                      scene_extent=extent, tcfg=tcfg, on_log=log,
                      log_every=max(1, min(50, args.iterations // 6)),
                      mesh=mesh, checkpoint_dir=ckpt_dir,
                      jsonl_path=jsonl)
    iterations = args.iterations
    resume_from = getattr(args, "resume", None)
    if resume_from:
        restored = trainer.resume(
            ckpt_dir if resume_from == "auto" else resume_from)
        # --iterations is the TOTAL budget: run only the remainder
        iterations = max(0, args.iterations - restored)
        print(f"resumed from step {restored} "
              f"({iterations} iterations remaining)")
    trainer.run(iterations)

    save_checkpoint(ckpt_dir, trainer.model, trainer.opt_state,
                    trainer.step)
    final_model = trainer.model
    if mesh is not None and jax.process_count() > 1:
        # gather the globally-sharded model so every process holds a local
        # copy for PLY export / final render (orbax above already wrote the
        # sharded checkpoint collectively)
        from jax.experimental import multihost_utils
        final_model = jax.tree.map(
            lambda x: np.asarray(
                multihost_utils.process_allgather(x, tiled=True)),
            trainer.model)
        final_model = final_model.replace(
            active=np.asarray(final_model.active).astype(bool))
    if jax.process_index() == 0:
        export_ply(os.path.join(args.out_dir, "point_cloud.ply"),
                   final_model)
        img = np.asarray(render_tiled(
            jax.tree.map(jnp.asarray, final_model), cams[0], trainer.rcfg,
            active_sh_degree=trainer.active_sh_degree))
        write_ppm(os.path.join(args.out_dir, "render.ppm"), img)
        print(f"saved checkpoint + ply + render to {args.out_dir}")

    if getattr(args, "eval_at_end", False) and jax.process_index() == 0:
        from intro_to_gaussian_splatting_tpu.train.evaluate import evaluate
        es = holdout_scene if holdout_scene.cameras else train_scene
        tag = "holdout" if holdout_scene.cameras else "train"
        rows = evaluate(jax.tree.map(jnp.asarray, final_model), es.cameras,
                        es.targets, trainer.rcfg,
                        active_sh_degree=trainer.active_sh_degree,
                        names=es.names)
        for r in rows:
            print(f"eval[{tag}] {r['name']:>20s}  psnr {r['psnr']:6.2f}  "
                  f"ssim {r['ssim']:.4f}")
    return 0
