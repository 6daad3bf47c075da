"""Command-line interface.

The reference has no CLI (its entry points are five notebooks, SURVEY.md L5);
this provides `gstpu render`, `gstpu train`, and `gstpu bench` over COLMAP
scene directories.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _add_scene_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("scene", help="COLMAP scene dir (containing sparse/0) or sparse model dir")
    p.add_argument("--image-index", type=int, default=0, help="camera index to render")
    p.add_argument("--downscale", type=int, default=1)
    p.add_argument("--min-track", type=int, default=2,
                   help="min track length filter (reference uses 2)")


def _resolve_sparse(path: str) -> str:
    from intro_to_gaussian_splatting_tpu.io.dataset import resolve_sparse
    try:
        return resolve_sparse(path)
    except FileNotFoundError as e:
        raise SystemExit(str(e))


def _load(args):
    from intro_to_gaussian_splatting_tpu.io import read_model
    from intro_to_gaussian_splatting_tpu.models import (
        camera_from_colmap, init_from_points,
    )
    sparse = _resolve_sparse(args.scene)
    cameras, images, points = read_model(sparse)
    points = points.filter_by_track_length(args.min_track)
    model = init_from_points(points.xyz, points.rgb)
    keys = sorted(images.keys())
    image = images[keys[args.image_index % len(keys)]]
    cam = camera_from_colmap(cameras[image.camera_id], image, args.downscale)
    return model, cam, points, (cameras[image.camera_id], image)


def write_ppm(path: str, img: np.ndarray) -> None:
    arr = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (arr.shape[1], arr.shape[0]))
        f.write(arr.tobytes())


def _rcfg_for(args):
    """RasterizerConfig from common CLI flags (incl. reference-compat)."""
    from intro_to_gaussian_splatting_tpu.config import (
        CompatConfig, RasterizerConfig,
    )
    compat = {
        "default": CompatConfig(),
        "reference-cpu": CompatConfig.REFERENCE_CPU,
        "reference-cuda": CompatConfig.REFERENCE_CUDA,
    }[getattr(args, "compat", "default")]
    return RasterizerConfig(tile_size=args.tile_size, compat=compat)


def cmd_render(args) -> int:
    from intro_to_gaussian_splatting_tpu.ops.render import render
    model, cam, points, _ = _load(args)
    config = _rcfg_for(args)
    t0 = time.time()
    img = np.asarray(render(model, cam, config, backend=args.backend))
    dt = time.time() - t0
    mpix = cam.width * cam.height / 1e6
    print(f"rendered {cam.width}x{cam.height} ({len(points)} gaussians) "
          f"in {dt:.3f}s [{mpix / dt:.2f} Mpix/s, backend={args.backend}]")
    write_ppm(args.output, img)
    print(f"wrote {args.output}")
    return 0


def cmd_points(args) -> int:
    """Point-projection sanity render (reference SURVEY.md section 3.5:
    GaussianScene.render_points_image, splat/gaussian_scene.py:44-51)."""
    from intro_to_gaussian_splatting_tpu.ops.points import (
        keypoint_reprojection_report, render_points_image,
    )
    model, cam, points, (cam_rec, image_rec) = _load(args)
    t0 = time.time()
    img = np.asarray(render_points_image(
        np.asarray(points.xyz, np.float32),
        np.asarray(points.rgb, np.float32) / 255.0,
        cam, splat_radius=args.radius))
    print(f"projected {len(points)} points in {time.time() - t0:.3f}s")
    write_ppm(args.output, img)
    print(f"wrote {args.output}")
    if args.compare_keypoints:
        r = keypoint_reprojection_report(points, cam_rec, image_rec,
                                         args.downscale)
        if r["n_matched"] == 0:
            print("keypoint overlay: no stored keypoints matched the "
                  "loaded points (nothing to compare)")
        else:
            print(f"keypoint overlay vs COLMAP ({r['n_matched']}/"
                  f"{r['n_keypoints']} keypoints matched): "
                  f"mean {r['mean_px']:.2f}px, median {r['median_px']:.2f}px,"
                  f" p90 {r['p90_px']:.2f}px, max {r['max_px']:.2f}px")
    return 0


def cmd_bench(args) -> int:
    from intro_to_gaussian_splatting_tpu.ops.render import render
    from intro_to_gaussian_splatting_tpu.utils.profiling import benchmark
    model, cam, points, _ = _load(args)
    config = _rcfg_for(args)
    res = benchmark(render, model, cam, config, backend=args.backend,
                    iters=args.iters)
    print(f"{cam.width}x{cam.height}, {len(points)} gaussians, "
          f"backend={args.backend}: {res.mean_s * 1e3:.2f} ms/frame "
          f"({res.mpix_per_s(cam.width, cam.height):.1f} Mpix/s), "
          f"compile {res.compile_s:.1f}s")
    return 0


def cmd_info(args) -> int:
    from intro_to_gaussian_splatting_tpu.io import read_model
    sparse = _resolve_sparse(args.scene)
    cameras, images, points = read_model(sparse)
    print(f"model dir: {sparse}")
    print(f"cameras: {len(cameras)}")
    for cid, c in sorted(cameras.items()):
        print(f"  [{cid}] {c.model} {c.width}x{c.height} fx={c.fx:.1f} fy={c.fy:.1f}")
    print(f"images: {len(images)}")
    print(f"points3D: {len(points)} "
          f"(track>=2: {int((points.track_lengths >= 2).sum())})")
    return 0


def cmd_train(args) -> int:
    if getattr(args, "multihost", False):
        from intro_to_gaussian_splatting_tpu.parallel.multihost import (
            init_multihost,
        )
        init_multihost(coordinator=args.coordinator,
                       num_processes=args.num_processes,
                       process_id=args.process_id)
    from intro_to_gaussian_splatting_tpu.train.trainer import train_cli
    return train_cli(args)


def cmd_eval(args) -> int:
    """PSNR/SSIM of a trained model on (held-out) scene cameras."""
    import os

    from intro_to_gaussian_splatting_tpu.config import RasterizerConfig
    from intro_to_gaussian_splatting_tpu.io.dataset import load_scene
    from intro_to_gaussian_splatting_tpu.train.checkpoint import import_ply
    from intro_to_gaussian_splatting_tpu.train.evaluate import (
        evaluate, render_views,
    )

    if not args.ply:
        raise SystemExit("gstpu eval requires --ply pointing at a trained "
                         "model (gstpu train writes point_cloud.ply)")
    model = import_ply(args.ply)
    scene = load_scene(args.scene, downscale=args.downscale,
                       min_track=args.min_track)
    if args.holdout > 0:
        _, scene = scene.split_holdout(args.holdout)
    if not scene.cameras:
        raise SystemExit("no cameras with ground-truth images to evaluate")
    # a densified trained model can hold far more pairs than the default
    # pool; a silently-overflowing pool would deflate PSNR/SSIM, so the
    # pool is a flag and every overflowing view is called out loudly
    rcfg = RasterizerConfig(tile_size=args.tile_size,
                            pairs_per_gaussian=args.pairs_per_gaussian)
    rows = evaluate(model, scene.cameras, scene.targets, rcfg,
                    names=scene.names)
    n_overflowed = 0
    for r in rows:
        flag = ""
        if r.get("overflowed"):
            n_overflowed += 1
            flag = "  [PAIR POOL OVERFLOW: metrics unreliable]"
        print(f"{r['name']:>24s}  psnr {r['psnr']:6.2f}  "
              f"ssim {r['ssim']:.4f}{flag}")
    if n_overflowed:
        print(f"WARNING: {n_overflowed} view(s) overflowed the pair pool; "
              f"re-run with a larger --pairs-per-gaussian "
              f"(currently {rcfg.pairs_per_gaussian})")
    if args.save_renders:
        os.makedirs(args.save_renders, exist_ok=True)
        for name, img in zip(scene.names,
                             render_views(model, scene.cameras, rcfg)):
            out = os.path.join(args.save_renders,
                               os.path.splitext(name)[0] + ".ppm")
            write_ppm(out, img)
        print(f"wrote {len(scene.cameras)} renders to {args.save_renders}")
    return 0


def cmd_fetch(args) -> int:
    """Download + extract a Mip-NeRF-360 dataset (ref get_data.sh:1)."""
    from intro_to_gaussian_splatting_tpu.io.fetch import fetch_dataset
    try:
        out = fetch_dataset(args.dataset, args.out_dir,
                            keep_zip=args.keep_zip)
    except RuntimeError as e:
        raise SystemExit(str(e))
    print(f"extracted {args.dataset} into {out}")
    return 0


def _select_platform(platform: str) -> None:
    """Pin the JAX platform BEFORE the first jax import takes effect.

    `--cpu` / GSTPU_PLATFORM=cpu exists because some TPU transports (e.g.
    remote-tunneled TPUs) block device->host transfers indefinitely, which
    every CLI command needs to write images; jax.config wins over the
    JAX_PLATFORMS env var under such transports."""
    import jax
    jax.config.update("jax_platforms", platform)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="gstpu",
                                     description="TPU-native gaussian splatting")
    parser.add_argument("--cpu", action="store_true",
                        help="run on host CPU (see also GSTPU_PLATFORM=cpu)")
    parser.add_argument("--platform", default=None,
                        help="explicit jax platform (cpu/tpu)")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("render", help="render one view of a COLMAP scene")
    _add_scene_args(p)
    p.add_argument("--output", "-o", default="render.ppm")
    p.add_argument("--tile-size", type=int, default=16)
    p.add_argument("--backend", choices=["auto", "dense", "pallas"], default="auto")
    p.add_argument("--compat",
                   choices=["default", "reference-cpu", "reference-cuda"],
                   default="default",
                   help="reproduce the reference implementation's quirks "
                        "bit-for-bit (double sigmoid, skipped last tile, "
                        "inclusive overlap / pixel bbox test)")
    p.set_defaults(fn=cmd_render)

    p = sub.add_parser("points", help="point-projection sanity render")
    _add_scene_args(p)
    p.add_argument("--output", "-o", default="points.ppm")
    p.add_argument("--radius", type=int, default=1, help="point splat radius, px")
    p.add_argument("--compare-keypoints", action="store_true",
                   help="report reprojection error of projected 3D points "
                        "vs COLMAP's stored 2D keypoints (the reference's "
                        "overlay sanity check, as numbers)")
    p.set_defaults(fn=cmd_points)

    p = sub.add_parser("bench", help="time the renderer on a scene view")
    _add_scene_args(p)
    p.add_argument("--tile-size", type=int, default=16)
    p.add_argument("--compat",
                   choices=["default", "reference-cpu", "reference-cuda"],
                   default="default")
    p.add_argument("--backend", choices=["auto", "dense", "pallas"], default="auto")
    p.add_argument("--iters", type=int, default=10)
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("info", help="print scene statistics")
    _add_scene_args(p)
    p.set_defaults(fn=cmd_info)

    p = sub.add_parser("train", help="optimize gaussians against scene images")
    _add_scene_args(p)
    p.add_argument("--iterations", type=int, default=1000)
    p.add_argument("--out-dir", default="./gstpu_out")
    p.add_argument("--holdout", type=int, default=0, metavar="N",
                   help="hold out every Nth view for eval (0 = train on all)")
    p.add_argument("--ssim-weight", type=float, default=None,
                   help="override TrainConfig.ssim_weight")
    p.add_argument("--camera-batch", type=int, default=1, metavar="B",
                   help="multi-camera batch DP: average gradients over B "
                        "same-size cameras per optimizer step (one "
                        "on-device scan; see train_step_batched)")
    p.add_argument("--eval-at-end", action="store_true",
                   help="print PSNR/SSIM on the holdout (or train) views "
                        "after training")
    p.add_argument("--checkpoint-every", type=int, default=0, metavar="N",
                   help="save full training state every N steps "
                        "(failure recovery; 0 = save at end only)")
    p.add_argument("--resume", nargs="?", const="auto", default=None,
                   metavar="CKPT_DIR",
                   help="resume from a checkpoint dir (bare --resume uses "
                        "<out-dir>/ckpt); --iterations is the TOTAL budget")
    mh = p.add_argument_group("multi-host (jax.distributed)")
    mh.add_argument("--multihost", action="store_true",
                    help="initialize jax.distributed before training "
                         "(run one process per host)")
    mh.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (defaults to TPU pod "
                         "auto-detection)")
    mh.add_argument("--num-processes", type=int, default=None)
    mh.add_argument("--process-id", type=int, default=None)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("eval", help="PSNR/SSIM of a trained model")
    _add_scene_args(p)
    p.add_argument("--ply", required=True,
                   help="trained model (gstpu train writes point_cloud.ply)")
    p.add_argument("--tile-size", type=int, default=16)
    p.add_argument("--pairs-per-gaussian", type=int, default=8,
                   help="pair-pool capacity per gaussian; overflowing "
                        "views are flagged (densified models need more)")
    p.add_argument("--holdout", type=int, default=0, metavar="N",
                   help="evaluate only every Nth view (holdout protocol)")
    p.add_argument("--save-renders", default=None, metavar="DIR",
                   help="also write each rendered view as PPM")
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("fetch", help="download a Mip-NeRF-360 dataset "
                       "(treehill lives in 360_extra)")
    p.add_argument("dataset", nargs="?", default="360_extra",
                   choices=["360_extra", "360"])
    p.add_argument("--out-dir", default="./data")
    p.add_argument("--keep-zip", action="store_true")
    p.set_defaults(fn=cmd_fetch)

    args = parser.parse_args(argv)
    import os
    platform = args.platform or os.environ.get("GSTPU_PLATFORM")
    if args.cpu:
        platform = "cpu"
    if platform:
        _select_platform(platform)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
