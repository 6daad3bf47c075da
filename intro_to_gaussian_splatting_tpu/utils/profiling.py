"""Profiling & roofline accounting.

The reference's only instrumentation is a wall clock around the CUDA call
plus ``torch.cuda.synchronize()`` (splat/gaussian_scene.py:269,283-284) and
tqdm bars on the tile loop (SURVEY.md section 5).  Here:

  * ``trace(...)``      -- context manager around ``jax.profiler.trace``
                           (produces a TensorBoard/xprof trace directory);
  * ``benchmark(...)``  -- compile-once, block-until-ready wall timing with
                           warmup, returning per-iteration stats;
  * ``rasterizer_roofline(...)`` -- analytic FLOP/byte counts for the
                           compositing kernel so measured Mpix/s can be
                           compared against the chip's compute/bandwidth
                           ceilings (the BASELINE "within 1.5x of roofline"
                           metric).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/gstpu_trace", enabled: bool = True):
    """``with trace("/tmp/t"): run_step()`` -> xprof trace in log_dir."""
    if not enabled:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


@dataclasses.dataclass
class BenchResult:
    mean_s: float
    min_s: float
    std_s: float
    iters: int
    compile_s: float

    def mpix_per_s(self, width: int, height: int) -> float:
        return width * height / 1e6 / self.mean_s


def _block(x):
    return jax.tree_util.tree_map(
        lambda l: l.block_until_ready() if hasattr(l, "block_until_ready") else l,
        x)


def benchmark(fn: Callable, *args, iters: int = 10, warmup: int = 2,
              **kwargs) -> BenchResult:
    """Time ``fn(*args, **kwargs)`` with proper device synchronization.

    First call is timed separately as compile time (the analogue of the
    reference's excluded nvcc JIT compile, splat/gaussian_scene.py:267).
    """
    t0 = time.perf_counter()
    _block(fn(*args, **kwargs))
    compile_s = time.perf_counter() - t0
    for _ in range(max(0, warmup - 1)):
        _block(fn(*args, **kwargs))
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _block(fn(*args, **kwargs))
        samples.append(time.perf_counter() - t0)
    s = np.asarray(samples)
    return BenchResult(mean_s=float(s.mean()), min_s=float(s.min()),
                       std_s=float(s.std()), iters=iters, compile_s=compile_s)


@dataclasses.dataclass
class Roofline:
    """Per-ceiling cost of one rasterizer pass.

    ``mxu_flops`` are MATHEMATICAL flops (2MKN); the f32 one-hot matmuls
    decompose into ``mxu_passes`` bf16 MXU passes (6 for HIGHEST, 3 HIGH,
    1 DEFAULT), so their time is flops * passes / bf16_peak. ``vpu_flops``
    run on the (8, 128) vector unit. The binding ceiling is whichever of
    MXU / VPU / HBM takes longest -- they overlap in the kernel.
    """

    vpu_flops: float
    mxu_flops: float
    mxu_passes: float
    hbm_bytes: float
    pixels: float

    def bound(self, peak_bf16: float, peak_bw: float,
              peak_vpu: Optional[float] = None) -> float:
        """Lower-bound kernel time (s) on a chip with the given ceilings.
        ``peak_vpu`` defaults to bf16_peak / 50 (the rough MXU:VPU flop
        ratio on recent TPUs -- see TPU_PEAKS for per-chip values)."""
        if peak_vpu is None:
            peak_vpu = peak_bf16 / 50.0
        return max(self.mxu_flops * self.mxu_passes / peak_bf16,
                   self.vpu_flops / peak_vpu,
                   self.hbm_bytes / peak_bw)

    def binding(self, peak_bf16: float, peak_bw: float,
                peak_vpu: Optional[float] = None) -> str:
        if peak_vpu is None:
            peak_vpu = peak_bf16 / 50.0
        t = {"mxu": self.mxu_flops * self.mxu_passes / peak_bf16,
             "vpu": self.vpu_flops / peak_vpu,
             "hbm": self.hbm_bytes / peak_bw}
        return max(t, key=t.get)


# Per (pixel, gaussian-pair-slot) VPU cost of one forward chunk step in the
# group-streamed Pallas kernel: alpha eval ~18 flops, segmented
# multiplicative transmittance scan ~3 x log2(chunk) per element, include/
# weight ~6.
_VPU_FLOPS_PER_PAIR_PIXEL = 45.0

_PRECISION_PASSES = {"highest": 6.0, "split3": 3.0, "default": 1.0}


def rasterizer_roofline(num_pairs: int, tile_size: int, chunk_size: int,
                        num_tiles: int, group_tiles: int = 64,
                        rec_rows: int = 16, out_channels: int = 5,
                        accum_precision: str = "highest") -> Roofline:
    """Analytic cost model for one forward pass of the Pallas rasterizer.

    ``num_pairs`` is the total (tile, gaussian) pair count after binning
    (bins.num_pairs) -- pass the DEMANDED count, pool-capacity clipping is
    the caller's concern. The stream is consumed in chunk_size-lane windows
    per tile GROUP, so account at chunk granularity with one average
    partial chunk per group. Per-tile accumulation is a one-hot MXU matmul
    per payload channel, (group_tiles, chunk) @ (chunk, pix): its cost
    scales LINEARLY with group_tiles and with the precision pass count, so
    dense pair streams want small groups / HIGH precision and sparse
    streams want large groups (fewer sequential grid steps).
    """
    pix = tile_size * tile_size
    num_groups = np.ceil(num_tiles / group_tiles)
    chunks = np.ceil(num_pairs / chunk_size) + num_groups
    pair_slots = chunks * chunk_size
    vpu = pair_slots * pix * _VPU_FLOPS_PER_PAIR_PIXEL
    mxu = chunks * 5 * (2.0 * group_tiles * chunk_size * pix)
    hbm = pair_slots * rec_rows * 4 + num_groups * group_tiles * pix * \
        out_channels * 4
    return Roofline(vpu_flops=vpu, mxu_flops=mxu,
                    mxu_passes=_PRECISION_PASSES[accum_precision],
                    hbm_bytes=hbm, pixels=num_tiles * pix)


def _load_trace_events(log_dir: str):
    """Newest profile under log_dir -> (trace_json_dict) or None."""
    import glob
    import gzip
    import json
    import os

    runs = sorted(glob.glob(os.path.join(log_dir, "plugins", "profile", "*")))
    if not runs:
        return None
    traces = glob.glob(os.path.join(runs[-1], "*.trace.json.gz"))
    if not traces:
        return None
    with gzip.open(traces[0]) as f:
        return json.load(f)


def device_module_durations(log_dir: str, name_substr: str):
    """Device-side per-execution durations (seconds) of jitted modules whose
    name contains ``name_substr``, from the newest xprof run in log_dir.

    This reads the 'XLA Modules' lane of the device process, i.e. true
    on-device execution time -- immune to async dispatch (host wall clocks
    under-measure by arbitrary factors when ``block_until_ready`` does not
    synchronize, as on remote-tunneled TPU transports).
    """
    tr = _load_trace_events(log_dir)
    if tr is None:
        return []
    events = tr.get("traceEvents", [])
    dev_pids = set()
    module_tids = {}          # (pid, tid) for thread_name == 'XLA Modules'
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name" and "device" in str(
                e.get("args", {}).get("name", "")).lower():
            dev_pids.add(e.get("pid"))
        if e.get("name") == "thread_name" and \
                e.get("args", {}).get("name") == "XLA Modules":
            module_tids[(e.get("pid"), e.get("tid"))] = True
    durs = []
    for e in events:
        if e.get("ph") != "X" or name_substr not in e.get("name", ""):
            continue
        pid = e.get("pid")
        if pid in dev_pids and (pid, e.get("tid")) in module_tids:
            durs.append(e["dur"] / 1e6)  # trace durs are microseconds
    return durs


def profile_device_time(fn, *args, iters: int = 5, warmup: int = 1,
                        name_substr: Optional[str] = None,
                        log_dir: str = "/tmp/gstpu_prof") -> list:
    """Run ``fn(*args)`` under a profiler trace and return the on-device
    duration (s) of each traced execution of the jitted module.

    ``name_substr`` defaults to ``jit_<fn.__name__>``-ish matching: pass the
    jitted function's name (e.g. "render_tiled") explicitly when wrapping.
    """
    import shutil

    if name_substr is None:
        name_substr = getattr(fn, "__name__", "jit_")
    shutil.rmtree(log_dir, ignore_errors=True)
    for _ in range(warmup):
        _block(fn(*args))
    with jax.profiler.trace(log_dir):
        for _ in range(iters):
            out = fn(*args)
        _block(out)
    return device_module_durations(log_dir, name_substr)


# Public per-chip ceilings (from published TPU specs) for convenience.
# VPU peaks are approximate (lane count x ALUs x clock, ~bf16_peak/50);
# published spec sheets only state MXU flops and HBM bandwidth.
TPU_PEAKS = {
    # name: (peak bf16 MXU FLOP/s, HBM bytes/s, approx VPU FLOP/s)
    "v4": (275e12, 1.2e12, 5.5e12),
    "v5e": (197e12, 0.82e12, 4e12),
    "v5p": (459e12, 2.77e12, 9e12),
    "v6e": (918e12, 1.64e12, 18e12),
}
