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

import functools
import json
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
    from intro_to_gaussian_splatting_tpu.models.gaussians import init_from_points
    from intro_to_gaussian_splatting_tpu.ops.rasterize_pallas import (
        render_tiled, render_tiles, tile_pixel_mask,
    )

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

    # IMPORTANT (axon/remote-TPU): model and cam must be explicit jit
    # ARGUMENTS, never closure captures. A closed-over device array becomes
    # an MLIR constant at lower() time, which forces a device->host fetch of
    # its value -- and device->host transfers block forever through the
    # remote-TPU tunnel. Same reason there are no float()/np.asarray()
    # fetches of device results anywhere on the TPU path here.
    # Training-step loss in the rasterizer's NATIVE tile layout: targets are
    # pre-tiled once per dataset (image_to_tiles), so the per-step loss needs
    # no untile relayout. The forward number below still renders the full
    # assembled (H, W, 3) image.
    mask = tile_pixel_mask(height, width, config)

    def loss(params, model, cam, mask):
        tiles = render_tiles(model.replace(**params), cam, config,
                             interpret=interpret)
        img = tiles[:, :3] * mask
        return jnp.sum(img * img)

    grad_fn = jax.jit(jax.grad(loss))
    fwd_fn = functools.partial(render_tiled, config=config,
                               interpret=interpret)

    mpix = width * height / 1e6
    iters = 5

    def host_timed(fn, *args):
        """Host wall clock per iteration -- valid where block_until_ready
        actually synchronizes (CPU, local TPU VMs)."""
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    # reference-equivalent workload: constant 1e-3 scales (tiny splats),
    # opacity inverse_sigmoid(0.9999) -- exactly the reference init.
    model_ref = init_from_points(xyz, rgb)
    params = model_ref.params()

    log("compiling forward ...")
    jax.block_until_ready(fwd_fn(model_ref, cam))
    log("compiling backward ...")
    jax.block_until_ready(grad_fn(params, model_ref, cam, mask))

    if backend == "tpu":
        # On remote-tunneled TPU, dispatch is async and block_until_ready
        # does NOT synchronize (host wall clocks read out impossibly fast).
        # The profiler's device lanes record true on-device times, so time
        # through one trace session and read back the module durations.
        from intro_to_gaussian_splatting_tpu.utils.profiling import (
            device_module_durations,
        )
        prof_dir = "/tmp/gstpu_bench_prof"
        import shutil
        shutil.rmtree(prof_dir, ignore_errors=True)
        log("tracing timed iterations ...")
        with jax.profiler.trace(prof_dir):
            for _ in range(iters):
                img = fwd_fn(model_ref, cam)
            for _ in range(iters):
                g = grad_fn(params, model_ref, cam, mask)
            jax.block_until_ready((img, g))
        log("parsing device trace ...")
        fwd_durs = device_module_durations(prof_dir, "jit_render_tiled")
        bwd_durs = device_module_durations(prof_dir, "jit_loss")
        log(f"device durations: fwd {[round(d*1e3,1) for d in fwd_durs]} ms, "
            f"bwd {[round(d*1e3,1) for d in bwd_durs]} ms")
        if fwd_durs and bwd_durs:
            fwd_s = float(np.median(fwd_durs))
            fb_s = float(np.median(bwd_durs))  # grad module includes fwd+bwd
        else:
            log("WARNING: no device trace events found; "
                "falling back to host clocks (may over-report)")
            fwd_s = host_timed(fwd_fn, model_ref, cam)
            fb_s = host_timed(grad_fn, params, model_ref, cam, mask)
    else:
        fwd_s = host_timed(fwd_fn, model_ref, cam)
        fb_s = host_timed(grad_fn, params, model_ref, cam, mask)

    log(f"fwd {fwd_s*1e3:.1f} ms ({mpix/fwd_s:.1f} Mpix/s) | "
        f"fwd+bwd {fb_s*1e3:.1f} ms ({mpix/fb_s:.1f} Mpix/s)")

    baseline_mpix_s = 6.8  # reference CUDA forward-only (BASELINE.md)
    result = {
        "metric": "fwd+bwd (tile-space train loss) Mpix/s/chip @ treehill scale (52k gaussians, 16.8 Mpix)",
        "value": round(mpix / fb_s, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix / fb_s / baseline_mpix_s, 2),
    }
    print(json.dumps(result))

    # optional denser workload (KNN scale init): opt-in, stderr-only, never
    # allowed to starve the headline JSON above.
    import os
    if os.environ.get("GSTPU_BENCH_EXTRA") == "1":
        model_knn = init_from_points(xyz, rgb, scale_init=None, opacity=0.9)
        pk = model_knn.params()
        jax.block_until_ready(fwd_fn(model_knn, cam))
        jax.block_until_ready(grad_fn(pk, model_knn, cam, mask))
        fwd_k = host_timed(fwd_fn, model_knn, cam)
        fb_k = host_timed(grad_fn, pk, model_knn, cam, mask)
        log(f"[knn-init, host clocks] fwd {fwd_k*1e3:.1f} ms | "
            f"fwd+bwd {fb_k*1e3:.1f} ms")


if __name__ == "__main__":
    main()
