#!/usr/bin/env python
"""Per-op device-time breakdown of the forward/backward render on TPU.

Dumps the top-K XLA ops by total device time from an xprof trace, so kernel
optimization targets are measured, not guessed. stderr only; dev tool.
"""

import collections
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from intro_to_gaussian_splatting_tpu.config import RasterizerConfig
from intro_to_gaussian_splatting_tpu.io.synthetic import (
    random_point_cloud, ring_cameras,
)
from intro_to_gaussian_splatting_tpu.models.camera import make_camera
from intro_to_gaussian_splatting_tpu.models.gaussians import init_from_points
from intro_to_gaussian_splatting_tpu.ops.rasterize_pallas import render_tiled
from intro_to_gaussian_splatting_tpu.utils.profiling import _load_trace_events


def op_breakdown(log_dir, top=25):
    tr = _load_trace_events(log_dir)
    events = tr.get("traceEvents", [])
    dev_pids = set()
    op_tids = set()
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name" and "device" in str(
                e.get("args", {}).get("name", "")).lower():
            dev_pids.add(e.get("pid"))
        if e.get("name") == "thread_name" and \
                "XLA Ops" in str(e.get("args", {}).get("name", "")):
            op_tids.add((e.get("pid"), e.get("tid")))
    agg = collections.Counter()
    cnt = collections.Counter()
    for e in events:
        if e.get("ph") != "X":
            continue
        pid = e.get("pid")
        if pid in dev_pids and (pid, e.get("tid")) in op_tids:
            agg[e.get("name", "?")] += e["dur"]
            cnt[e.get("name", "?")] += 1
    total = sum(agg.values())
    print(f"-- total device op time: {total/1e3:.1f} ms "
          f"(over all traced iterations)", file=sys.stderr)
    for name, dur in agg.most_common(top):
        print(f"{dur/1e3:9.2f} ms  x{cnt[name]:<4d} {name[:110]}",
              file=sys.stderr)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    n_gauss, width, height = 52363, 5068, 3324
    xyz, rgb = random_point_cloud(n_gauss, seed=0, extent=10.0)
    qvec, tvec = ring_cameras(1, width, height, radius=14.0, z=3.0, seed=0)[0]
    cam = make_camera(fx=0.78 * width, fy=0.78 * width, width=width,
                      height=height, qvec=qvec, tvec=tvec)
    config = RasterizerConfig()
    model = init_from_points(xyz, rgb)

    if mode == "fwd":
        fn = lambda: render_tiled(model, cam, config, interpret=False)
    else:
        # mirror bench.py: tile-space loss, pre-tiled mask
        from intro_to_gaussian_splatting_tpu.ops.rasterize_pallas import (
            render_tiles, tile_pixel_mask,
        )
        params = model.params()
        mask = tile_pixel_mask(height, width, config)

        def loss(p, model, cam, mask):
            tiles = render_tiles(model.replace(**p), cam, config,
                                 interpret=False)
            img = tiles[:, :3] * mask
            return jnp.sum(img * img)

        g = jax.jit(jax.grad(loss))
        fn = lambda: g(params, model, cam, mask)

    print("compiling ...", file=sys.stderr)
    jax.block_until_ready(fn())
    log_dir = "/tmp/gstpu_opprof"
    shutil.rmtree(log_dir, ignore_errors=True)
    with jax.profiler.trace(log_dir):
        for _ in range(3):
            out = fn()
        jax.block_until_ready(out)
    op_breakdown(log_dir)


if __name__ == "__main__":
    main()
