#!/usr/bin/env python
"""Benchmark: treehill-scale TRAINING STEP (fwd+bwd+Adam) on one TPU chip.

The reference's only perf number is 2.479 s for a forward-only CUDA render of
the treehill scene -- 52,363 gaussians at 5068x3324 (~16.8 Mpix), i.e. ~6.8
Mpix/s (BASELINE.md). The treehill dataset itself is unreachable from this
zero-egress image, so the workload is reproduced synthetically at identical
scale: same gaussian count, same resolution.

Two workloads are timed (both through the profiler's device lanes):
  * "ref-init": the reference's exact init (constant 1e-3 scales -> ~1 px
    splats, a nearly-empty pair stream -- the easy case, and exactly what the
    reference's own 2.479 s measures);
  * "knn-init": paper-correct 3-NN mean-distance scales (what training
    actually produces) -- a dense pair stream, reported alongside.

The HEADLINE metric times the REAL training path: `train.trainer.train_step`
(projection, binning, Pallas fwd+bwd, tile-space L1 + SSIM, probe gradients,
Adam update) -- not a proxy loss. Roofline ratios compare the forward
render's device time against the analytic HBM/FLOP bound for the measured
pair count (utils/profiling.rasterizer_roofline).

Prints exactly ONE JSON line to stdout (extra context keys beyond
metric/value/unit/vs_baseline are informational):
  {"metric": "...train step Mpix/s/chip...", "value": ..., "unit":
   "Mpix/s", "vs_baseline": value / 6.8, ...}
vs_baseline > 1 means one full optimization step runs faster than the
reference's forward-only CUDA render.
"""

import functools
import json
import os
import sys
import time

import numpy as np


_T0 = time.perf_counter()


def log(*a):
    print(f"[{time.perf_counter() - _T0:7.1f}s]", *a, file=sys.stderr,
          flush=True)


def _count_pairs_on_cpu(model, cam, config):
    """bins.num_pairs for the roofline model, computed on the host CPU
    backend (a device->host fetch of the TPU value can block on tunneled
    transports; the count is input-deterministic, so the CPU run is exact)."""
    import jax

    from intro_to_gaussian_splatting_tpu.ops.binning import bin_gaussians
    from intro_to_gaussian_splatting_tpu.ops.projection import (
        project_gaussians,
    )

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        m = jax.device_put(jax.tree.map(np.asarray, model), cpu)
        c = jax.device_put(jax.tree.map(np.asarray, cam), cpu)
        proj = project_gaussians(m, c, config)
        bins = bin_gaussians(proj, cam.width, cam.height, config)
        return int(bins.num_pairs)


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
    from intro_to_gaussian_splatting_tpu.models.gaussians import init_from_points
    from intro_to_gaussian_splatting_tpu.ops.binning import tile_grid
    from intro_to_gaussian_splatting_tpu.ops.rasterize_pallas import (
        image_to_tiles, render_tiled, tile_pixel_mask,
    )
    from intro_to_gaussian_splatting_tpu.train import densify as D
    from intro_to_gaussian_splatting_tpu.train.trainer import (
        make_optimizer, train_step,
    )
    from intro_to_gaussian_splatting_tpu.utils.profiling import (
        TPU_PEAKS, rasterizer_roofline,
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
    tcfg = TrainConfig()
    interpret = backend != "tpu"
    mpix = width * height / 1e6
    iters = 5

    # IMPORTANT (axon/remote-TPU): model and cam must be explicit jit
    # ARGUMENTS, never closure captures, and NO device value is ever fetched
    # to the host on the TPU path (device->host transfers can block forever
    # through the remote-TPU tunnel; timing comes from the profiler's device
    # lanes instead).

    # synthetic ground-truth target: a smooth gradient image, pre-tiled once
    # exactly as Trainer does
    yy = np.linspace(0.0, 1.0, height, dtype=np.float32)[:, None, None]
    xx = np.linspace(0.0, 1.0, width, dtype=np.float32)[None, :, None]
    target = np.broadcast_to(
        np.concatenate([yy + 0 * xx, 0 * yy + xx, 0.5 * (yy + xx)], axis=2),
        (height, width, 3)).copy()
    target = jnp.asarray(target)
    target_tiles = jax.jit(image_to_tiles, static_argnames="config")(
        target, config)
    target_mask = tile_pixel_mask(height, width, config)
    target_chw = jnp.transpose(target, (2, 0, 1))  # SSIM layout

    def setup_train(model):
        scene_extent = 10.0
        tx = make_optimizer(tcfg, scene_extent)
        opt_state = tx.init(model.params())
        dstate = D.DensifyState.zero(model.capacity)
        return tx, opt_state, dstate

    fwd_fn = functools.partial(render_tiled, config=config,
                               interpret=interpret)

    def timed_workloads(tag, model):
        """Compile + run fwd and train_step; returns dict of device ms."""
        tx, opt_state, dstate = setup_train(model)
        params = model.params()

        log(f"[{tag}] compiling forward ...")
        out = fwd_fn(model, cam)
        log(f"[{tag}] compiling train step (tile L1 + SSIM + Adam) ...")
        st = train_step(model, opt_state, dstate, cam, target_tiles,
                        target_mask, target_chw, config, tcfg, tx, 0)
        jax.block_until_ready((out, st[3]["loss"]))

        if backend == "tpu":
            from intro_to_gaussian_splatting_tpu.utils.profiling import (
                device_module_durations,
            )
            prof_dir = f"/tmp/gstpu_bench_prof_{tag}"
            import shutil
            shutil.rmtree(prof_dir, ignore_errors=True)
            log(f"[{tag}] tracing timed iterations ...")
            with jax.profiler.trace(prof_dir):
                for _ in range(iters):
                    img = fwd_fn(model, cam)
                st = (model, opt_state, dstate)
                for _ in range(iters):
                    st = train_step(st[0], st[1], st[2], cam, target_tiles,
                                    target_mask, target_chw, config, tcfg, tx,
                                    0)[:3]
                jax.block_until_ready((img, st[0].means))
            log(f"[{tag}] parsing device trace ...")
            fwd_durs = device_module_durations(prof_dir, "jit_render_tiled")
            ts_durs = device_module_durations(prof_dir, "jit_train_step")
            log(f"[{tag}] device durations: fwd "
                f"{[round(d*1e3,1) for d in fwd_durs]} ms, train_step "
                f"{[round(d*1e3,1) for d in ts_durs]} ms")
            fwd_s = float(np.median(fwd_durs)) if fwd_durs else float("nan")
            step_s = float(np.median(ts_durs)) if ts_durs else float("nan")
        else:
            def host_timed(fn):
                t0 = time.perf_counter()
                for _ in range(iters):
                    out = fn()
                jax.block_until_ready(out)
                return (time.perf_counter() - t0) / iters

            fwd_s = host_timed(lambda: fwd_fn(model, cam))
            stt = [model, opt_state, dstate]

            def one_step():
                r = train_step(stt[0], stt[1], stt[2], cam, target_tiles,
                               target_mask, target_chw, config, tcfg, tx, 0)
                stt[0], stt[1], stt[2] = r[0], r[1], r[2]
                return r[3]["loss"]

            step_s = host_timed(one_step)

        log(f"[{tag}] fwd {fwd_s*1e3:.1f} ms ({mpix/fwd_s:.1f} Mpix/s) | "
            f"train_step {step_s*1e3:.1f} ms ({mpix/step_s:.1f} Mpix/s)")
        return dict(fwd_s=fwd_s, step_s=step_s)

    def roofline_ratio(model, fwd_s):
        """measured forward ms vs analytic bound on this chip's ceilings."""
        try:
            num_pairs = _count_pairs_on_cpu(model, cam, config)
        except Exception as e:  # never let the roofline sink the bench
            log(f"roofline pair-count failed: {e!r}")
            return None, None
        ntx, nty = tile_grid(width, height, config.tile_size)
        rf = rasterizer_roofline(num_pairs, config.tile_size,
                                 config.chunk_size, ntx * nty,
                                 config.group_tiles)
        peak = TPU_PEAKS.get("v5e")
        bound_s = rf.bound(*peak)
        return num_pairs, fwd_s / bound_s

    # --- workload 1: reference init (tiny splats, near-empty pair stream)
    model_ref = init_from_points(xyz, rgb)
    ref = timed_workloads("ref-init", model_ref)

    # --- workload 2: KNN scale init (dense pair stream -- training-like)
    model_knn = init_from_points(xyz, rgb, scale_init=None, opacity=0.9)
    knn = timed_workloads("knn-init", model_knn)

    pairs_ref, ratio_ref = roofline_ratio(model_ref, ref["fwd_s"])
    pairs_knn, ratio_knn = roofline_ratio(model_knn, knn["fwd_s"])
    if ratio_ref is not None:
        log(f"roofline: ref-init {pairs_ref} pairs, fwd measured/bound = "
            f"{ratio_ref:.2f}x; knn-init {pairs_knn} pairs, "
            f"{ratio_knn:.2f}x (v5e ceilings)")

    baseline_mpix_s = 6.8  # reference CUDA forward-only (BASELINE.md)
    value = mpix / ref["step_s"]
    result = {
        "metric": ("full train step (fwd+bwd+SSIM+Adam) Mpix/s/chip @ "
                   "treehill scale (52k gaussians, 16.8 Mpix)"),
        "value": round(value, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(value / baseline_mpix_s, 2),
        "fwd_mpix_s": round(mpix / ref["fwd_s"], 2),
        "knn_init_step_mpix_s": round(mpix / knn["step_s"], 2),
        "knn_init_fwd_mpix_s": round(mpix / knn["fwd_s"], 2),
        "roofline_fwd_ratio_ref": (round(ratio_ref, 3)
                                   if ratio_ref is not None else None),
        "roofline_fwd_ratio_knn": (round(ratio_knn, 3)
                                   if ratio_knn is not None else None),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
