#!/usr/bin/env python
"""TPU probe: rasterizer kernel timing across (group_tiles, groups_per_step).

Times the bare rasterizer kernel (fwd and fwd+bwd) at treehill ref-init
scale across kernel shape knobs. An earlier revision also swept
accum_precision (split3 vs highest vs default) -- those measurements, now
recorded in PERF.md, showed the one-hot matmul pass count is ~0.6 ms of a
9.4 ms kernel and split3's VPU decomposition costs more than it saves, so
"highest" remains the default.

Usage: python scripts/probe_split3.py   (TPU; several minutes of compiles)
"""

import dataclasses
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

    from intro_to_gaussian_splatting_tpu.config import RasterizerConfig
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
        rasterize_pairs,
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
    if interpret:
        n_gauss, width, height = 4000, 1024, 640
    xyz, rgb = random_point_cloud(n_gauss, seed=0, extent=10.0)
    qvec, tvec = ring_cameras(1, width, height, radius=14.0, z=3.0, seed=0)[0]
    cam = make_camera(fx=0.78 * width, fy=0.78 * width, width=width,
                      height=height, qvec=qvec, tvec=tvec)
    model = init_from_points(xyz, rgb)
    base = RasterizerConfig()
    ts = base.tile_size
    ntx, nty = tile_grid(width, height, ts)

    def make_bins_for(cfg):
        @jax.jit
        def make_bins(m):
            proj = project_gaussians(m, cam, cfg)
            bins = bin_gaussians(proj, width, height, cfg)
            return bins.pair_records, bins.group_starts
        return make_bins(model)

    def kernel_chain(cfg, records, group_starts, grad):
        num_groups = num_groups_for(ntx * nty, cfg)

        @jax.jit
        def chain(records, group_starts, n):
            def scalar(rec):
                tiles = rasterize_pairs(rec, group_starts, num_groups, cfg,
                                        interpret)
                return jnp.sum(tiles[:, 0, 0, ::64])

            def body(i, acc):
                rec = records + acc * 1e-30
                if grad:
                    return acc + jax.grad(scalar)(rec)[0, 0]
                return acc + scalar(rec)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return functools.partial(chain, records, group_starts)

    def timed(chain, iters=20):
        def run(n):
            return host_fetch_scalar(chain(jnp.int32(n)))
        run(1)
        for mult in (1, 4, 16):
            it = iters * mult
            for _ in range(2):
                t1 = time.perf_counter(); run(it)
                t1 = time.perf_counter() - t1
                t2 = time.perf_counter(); run(2 * it)
                t2 = time.perf_counter() - t2
                if t2 > t1 * 1.2 and t2 > 0.25:
                    return (t2 - t1) / it
        return float("nan")

    for gt in (64, 32):
        for gps in (4, 16):
            cfg = dataclasses.replace(base, accum_precision="highest",
                                      group_tiles=gt, groups_per_step=gps)
            rec, gs = make_bins_for(cfg)
            tf = timed(kernel_chain(cfg, rec, gs, False))
            tg = timed(kernel_chain(cfg, rec, gs, True))
            log(f"gt={gt:3d} gps={gps:2d}: fwd {tf*1e3:7.3f} ms | "
                f"fwd+bwd {tg*1e3:7.3f} ms")
            print(f"{gt},{gps},{tf*1e3:.3f},{tg*1e3:.3f}", flush=True)


if __name__ == "__main__":
    main()
