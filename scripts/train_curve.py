#!/usr/bin/env python
"""Real-hardware training run: optimize a synthetic scene on the TPU and
record the (step, loss, PSNR, num_active) curve as JSONL.

Proves on hardware what the unit tests prove on CPU: densify/prune
recompiles, opacity resets, pair-pool growth and the fused photometric
loss survive a real multi-hundred-step optimization, and PSNR climbs
(SURVEY.md section 7 stage 4 gate). All device reads go through the
tunnel-safe fetch path (Trainer._fetch_metrics); the ground-truth targets
are rendered ON DEVICE from a denser "true" model and never leave the
chip.

Usage:
  python scripts/train_curve.py [--steps 600] [--out TRAIN_CURVE.jsonl]
                                [--mpix 1.3]
Writes one JSON object per log boundary plus a final summary line.
"""

import argparse
import json
import sys
import time

import numpy as np

_T0 = time.perf_counter()


def log(*a):
    print(f"[{time.perf_counter() - _T0:7.1f}s]", *a, file=sys.stderr,
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--out", default="TRAIN_CURVE.jsonl")
    ap.add_argument("--mpix", type=float, default=1.3)
    ap.add_argument("--cameras", type=int, default=4)
    ap.add_argument("--true-n", type=int, default=60_000)
    ap.add_argument("--init-n", type=int, default=12_000)
    ap.add_argument("--camera-batch", type=int, default=1,
                    help="multi-camera batch DP: B cameras per optimizer "
                         "step in ONE on-device scan -- amortizes the "
                         "per-step host dispatch (which dominates wall "
                         "time on tunneled transports)")
    args = ap.parse_args()

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
    from intro_to_gaussian_splatting_tpu.ops.rasterize_pallas import (
        render_tiled,
    )
    from intro_to_gaussian_splatting_tpu.train.trainer import (
        Trainer, scene_extent_of,
    )
    from intro_to_gaussian_splatting_tpu.utils.fetch import warm_fetch

    backend = jax.default_backend()
    log(f"backend: {backend}")
    if backend == "tpu":
        import threading
        warm = threading.Thread(target=warm_fetch)
        warm.start()
    width = int(round((args.mpix * 1e6 * 3 / 2) ** 0.5 / 16) * 16)
    height = int(round(width * 2 / 3 / 16) * 16)
    log(f"scene: {width}x{height} ({width * height / 1e6:.2f} Mpix), "
        f"true={args.true_n} gaussians, init={args.init_n}")

    rcfg = RasterizerConfig(pairs_per_gaussian=8)
    # a dense, opaque "true" scene the optimizer must reproduce
    xyz_t, rgb_t = random_point_cloud(args.true_n, seed=3, extent=8.0)
    true_model = init_from_points(xyz_t, rgb_t, scale_init=0.06,
                                  opacity=0.9, sh_degree=0,
                                  color_space="sh")
    cams = []
    for qvec, tvec in ring_cameras(args.cameras, width, height,
                                   radius=12.0, z=2.5, seed=1):
        cams.append(make_camera(fx=0.85 * width, fy=0.85 * width,
                                width=width, height=height,
                                qvec=qvec, tvec=tvec))
    # targets rendered ON DEVICE (no host round trip)
    targets = [render_tiled(true_model, c, rcfg) for c in cams]
    log("targets rendered (device-resident)")

    # optimize from a sparse subsample: densify must grow it back
    xyz_i, rgb_i = xyz_t[:args.init_n], rgb_t[:args.init_n]
    tcfg = TrainConfig(
        iterations=args.steps, ssim_weight=0.2,
        densify_start=100, densify_stop=args.steps - 100,
        densify_interval=100, opacity_reset_interval=0,
        capacity_multiplier=6.0, sh_degree=0,
        camera_batch=args.camera_batch,
    )
    model = init_from_points(
        xyz_i, rgb_i, sh_degree=0, color_space="sh",
        capacity=int(args.init_n * tcfg.capacity_multiplier),
        opacity=0.1, scale_init=None)      # KNN scale init (honest path)
    if backend == "tpu":
        warm.join()
        log("fetch warm")

    rows = []

    def on_log(m):
        rows.append(dict(m))
        log(" ".join(f"{k}={v}" for k, v in m.items()))

    trainer = Trainer(model=model, cameras=cams, targets=targets,
                      scene_extent=scene_extent_of(xyz_t), rcfg=rcfg,
                      tcfg=tcfg, log_every=25, on_log=on_log,
                      jsonl_path=args.out)
    t0 = time.perf_counter()
    trainer.run(args.steps)
    wall = time.perf_counter() - t0

    psnrs = [r["psnr"] for r in rows if "psnr" in r]
    summary = dict(
        event="summary", backend=backend, steps=args.steps,
        width=width, height=height,
        wall_s=round(wall, 1),
        steps_per_s=round(args.steps / wall, 2),
        first_psnr=round(psnrs[0], 3), best_psnr=round(max(psnrs), 3),
        final_psnr=round(psnrs[-1], 3),
        final_active=int(rows[-1]["num_active"]),
        pairs_per_gaussian=trainer.rcfg.pairs_per_gaussian,
        camera_batch=args.camera_batch,
    )
    with open(args.out, "a") as f:
        f.write(json.dumps(summary) + "\n")
    log("summary:", json.dumps(summary))
    ok = summary["final_psnr"] > summary["first_psnr"] + 1.0
    print(json.dumps(summary))
    if not ok:
        log("WARNING: PSNR did not climb by >1 dB")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
