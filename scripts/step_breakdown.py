#!/usr/bin/env python
"""Chain-timed breakdown of the training-step components on the real TPU.

Times nested prefixes of the train-step graph (projection -> +binning ->
+raster kernel -> +tile L1 -> +SSIM(untile_chw + fused kernel) -> full
train_step) with the same data-chained fori_loop + single host fetch used
by bench.py, so each component's marginal device cost is the difference of
adjacent rows. Guides kernel work: optimize what actually costs ms.

Usage: python scripts/step_breakdown.py  (TPU; ~5-10 min incl. compiles)
"""

import functools
import sys
import time

import numpy as np

_T0 = time.perf_counter()


def log(*a):
    print(f"[{time.perf_counter() - _T0:7.1f}s]", *a, file=sys.stderr,
          flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from intro_to_gaussian_splatting_tpu.config import (
        RasterizerConfig, TrainConfig,
    )
    from intro_to_gaussian_splatting_tpu.io.synthetic import (
        random_point_cloud, ring_cameras,
    )
    from intro_to_gaussian_splatting_tpu.models.camera import make_camera
    from intro_to_gaussian_splatting_tpu.models.gaussians import (
        init_from_points,
    )
    from intro_to_gaussian_splatting_tpu.ops.binning import (
        bin_gaussians, num_groups_for, tile_grid,
    )
    from intro_to_gaussian_splatting_tpu.ops.projection import (
        project_gaussians,
    )
    from intro_to_gaussian_splatting_tpu.ops.rasterize_pallas import (
        image_to_tiles, rasterize_pairs, tile_pixel_mask, untile_chw,
    )
    from intro_to_gaussian_splatting_tpu.ops.ssim_pallas import fused_ssim
    from intro_to_gaussian_splatting_tpu.train import densify as D
    from intro_to_gaussian_splatting_tpu.train.loss import tile_l1
    from intro_to_gaussian_splatting_tpu.train.trainer import (
        make_optimizer, train_step,
    )
    from intro_to_gaussian_splatting_tpu.utils.fetch import (
        host_fetch_scalar, warm_fetch,
    )

    backend = jax.default_backend()
    log(f"backend: {backend}")
    interpret = backend != "tpu"
    if backend == "tpu":
        warm_fetch()
        log("fetch warm")

    n_gauss, width, height = 52363, 5068, 3324
    if backend != "tpu":
        n_gauss, width, height = 4000, 1024, 640
    xyz, rgb = random_point_cloud(n_gauss, seed=0, extent=10.0)
    qvec, tvec = ring_cameras(1, width, height, radius=14.0, z=3.0, seed=0)[0]
    cam = make_camera(fx=0.78 * width, fy=0.78 * width, width=width,
                      height=height, qvec=qvec, tvec=tvec)
    cfg = RasterizerConfig()
    tcfg = TrainConfig()
    ts = cfg.tile_size
    ntx, nty = tile_grid(width, height, ts)
    num_groups = num_groups_for(ntx * nty, cfg)
    model = init_from_points(xyz, rgb)   # ref init (bench headline workload)

    yy = np.linspace(0, 1, height, dtype=np.float32)[:, None, None]
    xx = np.linspace(0, 1, width, dtype=np.float32)[None, :, None]
    target = jnp.asarray(np.broadcast_to(
        np.concatenate([yy + 0 * xx, 0 * yy + xx, .5 * (yy + xx)], 2),
        (height, width, 3)).copy())
    target_tiles = jax.jit(image_to_tiles, static_argnames="config")(
        target, cfg)
    target_mask = tile_pixel_mask(height, width, cfg)
    target_chw = jnp.transpose(target, (2, 0, 1))

    # --- nested prefixes of the step graph, each -> scalar ----------------
    def stage_proj(m, tt, tm, tc):
        proj = project_gaussians(m, cam, cfg)
        return jnp.sum(proj.mean2d[:, 0] * 1e-6)

    def stage_bin(m, tt, tm, tc):
        proj = project_gaussians(m, cam, cfg)
        bins = bin_gaussians(proj, width, height, cfg)
        return jnp.sum(bins.pair_records[0, ::1024] * 1e-6)

    def stage_raster(m, tt, tm, tc):
        proj = project_gaussians(m, cam, cfg)
        bins = bin_gaussians(proj, width, height, cfg)
        tiles = rasterize_pairs(bins.pair_records, bins.group_starts,
                                num_groups, cfg, interpret)
        return tiles[0, 0, 0, 0]

    def stage_l1(m, tt, tm, tc):
        proj = project_gaussians(m, cam, cfg)
        bins = bin_gaussians(proj, width, height, cfg)
        tiles = rasterize_pairs(bins.pair_records, bins.group_starts,
                                num_groups, cfg, interpret)
        return tile_l1(tiles, tt, tm)

    def untile3(tiles):
        """Exactly the train_step dispatch (trainer.loss_fn)."""
        if interpret:
            return untile_chw(tiles[:, :3], ntx, nty, ts, height, width)
        from intro_to_gaussian_splatting_tpu.ops.relayout_pallas import (
            untile_chw_fast,
        )
        return untile_chw_fast(tiles[:, :4], ntx, nty, ts, height, width,
                               False)

    def stage_untile(m, tt, tm, tc):
        proj = project_gaussians(m, cam, cfg)
        bins = bin_gaussians(proj, width, height, cfg)
        tiles = rasterize_pairs(bins.pair_records, bins.group_starts,
                                num_groups, cfg, interpret)
        img = untile3(tiles)
        return tile_l1(tiles, tt, tm) + jnp.sum(img[:, ::512, ::512]) * 1e-9

    def stage_ssim(m, tt, tm, tc):
        proj = project_gaussians(m, cam, cfg)
        bins = bin_gaussians(proj, width, height, cfg)
        tiles = rasterize_pairs(bins.pair_records, bins.group_starts,
                                num_groups, cfg, interpret)
        img = untile3(tiles)
        l = tile_l1(tiles, tt, tm)
        return (1 - tcfg.ssim_weight) * l + tcfg.ssim_weight * (
            1 - fused_ssim(img, tc, grad_target=False))

    stages = [("proj fwd", stage_proj, False),
              ("+binning fwd", stage_bin, False),
              ("+raster fwd", stage_raster, False),
              ("+tile_l1 fwd", stage_l1, False),
              ("+untile_chw fwd", stage_untile, False),
              ("+fused_ssim fwd", stage_ssim, False),
              ("loss grad (no ssim)", stage_l1, True),
              ("loss grad (+untile)", stage_untile, True),
              ("loss grad (full)", stage_ssim, True)]

    def make_chain(fn, grad):
        if grad:
            def scalar(m, tt, tm, tc):
                g = jax.grad(lambda params: fn(
                    model.replace(**params), tt, tm, tc))(m.params())
                return jnp.sum(g["means"][0] * 1e-6)
        else:
            scalar = fn

        @jax.jit
        def chain(m, tt, tm, tc, n):
            def body(i, acc):
                mm = m.replace(means=m.means + acc * 1e-30)
                return acc + scalar(mm, tt, tm, tc)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return chain

    iters = 10 if backend == "tpu" else 2

    def timed(chain):
        def run(n):
            return host_fetch_scalar(
                chain(model, target_tiles, target_mask, target_chw,
                      jnp.int32(n)))
        run(1)
        # escalate the chain length until dispatch/fetch overhead is small
        # vs device time (fast stages need ~1000 iters to resolve)
        for mult in (1, 10, 100):
            it = iters * mult
            for _ in range(2):
                t1 = time.perf_counter(); run(it)
                t1 = time.perf_counter() - t1
                t2 = time.perf_counter(); run(2 * it)
                t2 = time.perf_counter() - t2
                if t2 > t1 * 1.2 and t2 > 0.25:
                    return (t2 - t1) / it
        return float("nan")

    prev = 0.0
    print(f"{'stage':24s} {'total ms':>9s} {'marginal ms':>12s}")
    for name, fn, grad in stages:
        t = timed(make_chain(fn, grad))
        log(f"{name}: {t*1e3:.2f} ms")
        print(f"{name:24s} {t*1e3:9.2f} {(t - prev)*1e3:12.2f}", flush=True)
        prev = t

    # the real train_step for reference
    tx = make_optimizer(tcfg, 10.0)
    opt_state = tx.init(model.params())
    dstate = D.DensifyState.zero(model.capacity)

    @jax.jit
    def step_chain(m, o, d, tt, tm, tc, n):
        def body(i, carry):
            mm, oo, dd = carry
            mm, oo, dd, _ = train_step(mm, oo, dd, cam, tt, tm, tc, cfg,
                                       tcfg, tx, 0)
            return (mm, oo, dd)
        return jax.lax.fori_loop(0, n, body, (m, o, d))

    def run_step(n):
        out = step_chain(model, opt_state, dstate, target_tiles,
                         target_mask, target_chw, jnp.int32(n))
        return host_fetch_scalar(out[0].means[0, 0])

    run_step(1)
    for _ in range(3):
        t1 = time.perf_counter(); run_step(iters)
        t1 = time.perf_counter() - t1
        t2 = time.perf_counter(); run_step(2 * iters)
        t2 = time.perf_counter() - t2
        if t2 > t1 * 1.2:
            print(f"{'full train_step':24s} {(t2-t1)/iters*1e3:9.2f}",
                  flush=True)
            break


if __name__ == "__main__":
    main()
