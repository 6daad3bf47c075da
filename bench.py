#!/usr/bin/env python
"""Benchmark: treehill-scale forward+backward rasterization on one TPU chip.

The reference's only perf number is 2.479 s for a forward-only CUDA render of
the treehill scene -- 52,363 gaussians at 5068x3324 (~16.8 Mpix), i.e. ~6.8
Mpix/s (BASELINE.md). The treehill dataset itself is unreachable from this
zero-egress image, so the workload is reproduced synthetically at identical
scale: same gaussian count, same resolution, same reference initialization
(constant 1e-3 scales -> small splats, matching the reference's actual
benchmark workload) plus a denser KNN-scale variant reported to stderr.

Prints exactly ONE JSON line to stdout:
  {"metric": "fwd+bwd Mpix/s/chip @ treehill scale", "value": ..., "unit":
   "Mpix/s", "vs_baseline": value / 6.8}
vs_baseline > 1 means faster than the reference's forward-only CUDA renderer
while also computing gradients it does not have.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


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
    from intro_to_gaussian_splatting_tpu.models.gaussians import init_from_points
    from intro_to_gaussian_splatting_tpu.ops.rasterize_pallas import render_tiled

    backend = jax.default_backend()
    log(f"backend: {backend}, devices: {jax.devices()}")

    # treehill scale (BASELINE.md): 52,363 gaussians, 5068x3324
    n_gauss = 52363
    width, height = 5068, 3324
    if backend != "tpu":
        # keep CI/CPU smoke runs tractable
        n_gauss, width, height = 4000, 1024, 640
        log("non-TPU backend: reduced bench size")

    xyz, rgb = random_point_cloud(n_gauss, seed=0, extent=10.0)
    qvec, tvec = ring_cameras(1, width, height, radius=14.0, z=3.0, seed=0)[0]
    focal = 0.78 * width
    cam = make_camera(fx=focal, fy=focal, width=width, height=height,
                      qvec=qvec, tvec=tvec)
    config = RasterizerConfig()
    interpret = backend != "tpu"

    def bench_case(name, model, iters=5):
        def fwd():
            return render_tiled(model, cam, config, interpret=interpret)

        def loss(params):
            img = render_tiled(model.replace(**params), cam, config,
                               interpret=interpret)
            return jnp.sum(img * img)

        grad_fn = jax.jit(jax.grad(loss))
        params = model.params()

        log(f"[{name}] compiling forward ...")
        img = fwd().block_until_ready()           # compile + warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            img = fwd()
        img.block_until_ready()
        fwd_s = (time.perf_counter() - t0) / iters

        log(f"[{name}] compiling backward ...")
        g = jax.block_until_ready(grad_fn(params))  # compile + warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            g = grad_fn(params)
        jax.block_until_ready(g)
        fb_s = (time.perf_counter() - t0) / iters

        mpix = width * height / 1e6
        log(f"[{name}] fwd {fwd_s*1e3:.1f} ms ({mpix/fwd_s:.1f} Mpix/s) | "
            f"fwd+bwd {fb_s*1e3:.1f} ms ({mpix/fb_s:.1f} Mpix/s) | "
            f"img mean {float(img.mean()):.4f}")
        return mpix / fwd_s, mpix / fb_s

    # 1. reference-equivalent workload: constant 1e-3 scales (tiny splats),
    #    opacity inverse_sigmoid(0.9999) -- exactly the reference init.
    model_ref = init_from_points(xyz, rgb)
    fwd_ref, fb_ref = bench_case("ref-init", model_ref)

    # 2. trained-like workload: KNN scale init, moderate opacity (denser
    #    coverage, more pairs per tile). Reported for honesty; not the
    #    headline (the reference never benchmarks this).
    try:
        model_knn = init_from_points(xyz, rgb, scale_init=None, opacity=0.9)
        bench_case("knn-init", model_knn, iters=3)
    except Exception as e:  # noqa: BLE001
        log("knn-init case failed:", e)

    baseline_mpix_s = 6.8  # reference CUDA forward-only (BASELINE.md)
    result = {
        "metric": "fwd+bwd Mpix/s/chip @ treehill scale (52k gaussians, 16.8 Mpix)",
        "value": round(fb_ref, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(fb_ref / baseline_mpix_s, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
