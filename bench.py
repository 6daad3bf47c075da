#!/usr/bin/env python
"""Benchmark: treehill-scale TRAINING STEP (fwd+bwd+Adam) on one TPU chip.

The reference's only perf number is 2.479 s for a forward-only CUDA render of
the treehill scene -- 52,363 gaussians at 5068x3324 (~16.8 Mpix), i.e. ~6.8
Mpix/s (BASELINE.md). The treehill dataset itself is unreachable from this
zero-egress image, so the workload is reproduced synthetically at identical
scale: same gaussian count, same resolution.

The HEADLINE metric times the REAL training path: `train.trainer.train_step`
(projection, binning, Pallas fwd+bwd, tile-space L1 + SSIM, probe gradients,
Adam update) -- not a proxy loss. Roofline ratios compare the forward
render's device time against the analytic HBM/FLOP bound for the measured
pair count (utils/profiling.rasterizer_roofline).

Budget discipline (the r03 bench timed out before printing anything):
  1. The first TPU->CPU cross-backend transfer on this tunneled transport
     takes 2-17 MINUTES of channel setup (measured; jax compile caching
     cannot help -- it is transfer warm-up, not compile). It is started in
     a BACKGROUND THREAD at t=0 and overlapped with all compilation.
  2. All chains take the iteration count as a DYNAMIC argument, so each
     graph compiles exactly once (n=1 warm and n/2n timing share it).
  3. The compiled-vs-interpret parity gate runs BEFORE any timing: even a
     timeout leaves on-chip correctness evidence in stderr.
  4. The headline JSON line prints as soon as the ref-init numbers exist.
     Everything after (dense-knn workload, SSIM gate, knn parity gate) is
     best-effort stderr-only, each stage gated on remaining wall clock.

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
import threading
import time

import numpy as np


_T0 = time.perf_counter()

# Wall-clock guards (seconds since process start). The driver's budget has
# historically been ~25 min; the headline must be out well before that, and
# optional extras must never be the reason it isn't.
EXTRA_STAGE_DEADLINE = float(os.environ.get("GSTPU_BENCH_EXTRA_DEADLINE",
                                            1000.0))


def elapsed():
    return time.perf_counter() - _T0


def log(*a):
    print(f"[{elapsed():7.1f}s]", *a, file=sys.stderr, flush=True)


def extras_allowed(stage):
    if elapsed() > EXTRA_STAGE_DEADLINE:
        log(f"[budget] skipping optional stage '{stage}' "
            f"(elapsed {elapsed():.0f}s > {EXTRA_STAGE_DEADLINE:.0f}s)")
        return False
    return True


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
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        # the axon sitecustomize force-registers the TPU backend and
        # overrides jax_platforms; honor an explicit CPU request (smoke runs)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from intro_to_gaussian_splatting_tpu.config import (
        RasterizerConfig, TrainConfig,
    )
    from intro_to_gaussian_splatting_tpu.io.synthetic import (
        random_point_cloud, ring_cameras,
    )
    from intro_to_gaussian_splatting_tpu.models.camera import make_camera
    from intro_to_gaussian_splatting_tpu.models.gaussians import init_from_points
    from intro_to_gaussian_splatting_tpu.ops.binning import (
        num_groups_for, tile_grid,
    )
    from intro_to_gaussian_splatting_tpu.ops.rasterize_pallas import (
        image_to_tiles, render_tiled, tile_pixel_mask,
    )
    from intro_to_gaussian_splatting_tpu.train import densify as D
    from intro_to_gaussian_splatting_tpu.train.trainer import (
        make_optimizer, train_step,
    )
    from intro_to_gaussian_splatting_tpu.utils.fetch import host_fetch_scalar
    from intro_to_gaussian_splatting_tpu.utils.profiling import (
        TPU_PEAKS, rasterizer_roofline,
    )

    backend = jax.default_backend()
    log(f"backend: {backend}, devices: {jax.devices()}")

    # --- fetch warm-up, overlapped -------------------------------------
    # The first cross-backend (TPU->CPU) transfer through the axon tunnel
    # takes 2-17 min of one-time channel setup; every later fetch is ~0.5 s.
    # Kick it off NOW in a thread and compile everything while it runs.
    warm_box = {"done": False, "err": None}

    def _warm():
        try:
            from intro_to_gaussian_splatting_tpu.utils.fetch import warm_fetch
            warm_fetch()
            warm_box["done"] = True
            log(f"fetch path warm (background, t={elapsed():.0f}s)")
        except BaseException as e:  # surfaced at join time
            warm_box["err"] = e

    warm_thread = None
    if backend == "tpu":
        log("starting fetch-path warm-up in background thread ...")
        warm_thread = threading.Thread(target=_warm, daemon=True)
        warm_thread.start()

    def join_warm():
        if warm_thread is not None and not warm_box["done"]:
            log("waiting for fetch-path warm-up ...")
            warm_thread.join()
            if warm_box["err"] is not None:
                raise warm_box["err"]

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
    iters = 10 if backend == "tpu" else 2

    # IMPORTANT (axon/remote-TPU): model and cam must be explicit jit
    # ARGUMENTS, never closure captures, and NO device value is ever fetched
    # to the host on the TPU path except through utils/fetch (direct
    # device->host transfers block forever through the remote-TPU tunnel).

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
    target_chw = jnp.transpose(target, (2, 0, 1))  # split-path SSIM layout
    # fused-loss path (the production default): ONE padded channel-major
    # target per camera; the whole photometric objective runs as a single
    # tile-space Pallas band pass (ops/fused_loss_pallas.py). The layout
    # depends only on (tile_size, H, W), so every config here shares it.
    from intro_to_gaussian_splatting_tpu.ops.fused_loss_pallas import (
        pad_target_chw,
    )
    ntx0, nty0 = tile_grid(width, height, config.tile_size)
    target_pad = jax.jit(pad_target_chw, static_argnums=(1, 2, 3, 4, 5))(
        target, ntx0, nty0, config.tile_size, height, width)
    fused = tcfg.ssim_weight > 0.0 and tcfg.fused_loss
    log(f"loss path: {'fused tile-space' if fused else 'split'}")

    def setup_train(model):
        scene_extent = 10.0
        tx = make_optimizer(tcfg, scene_extent)
        opt_state = tx.init(model.params())
        dstate = D.DensifyState.zero(model.capacity)
        return tx, opt_state, dstate

    def make_fwd(cfg):
        return functools.partial(render_tiled, config=cfg,
                                 interpret=interpret)

    # --- timing strategy -----------------------------------------------
    # On TPU, time N data-chained iterations inside one jit (fori_loop
    # serializes them on device) and force completion with ONE host fetch
    # through utils/fetch.host_fetch_scalar; per-iteration time =
    # (t(2N) - t(N))/N, which cancels dispatch/fetch overhead. The chain
    # length n is a DYNAMIC argument so each graph compiles exactly once.

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def fwd_chain(model, cam, n, cfg):
        fwd_fn = make_fwd(cfg)

        def body(i, acc):
            m = model.replace(
                means=model.means + acc * 1e-30)  # data dependency
            img = fwd_fn(m, cam)
            return acc + img[0, 0, 0]
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    def make_step_chain(tx):
        # targets MUST be explicit arguments: closure-captured device arrays
        # become HLO constants (hundreds of MB -> remote-compile rejects the
        # payload, and device->host fetches of them block on this transport).
        # On the fused path tt/tm are unused (pass None) and tc is the
        # padded fused-loss target.
        @functools.partial(jax.jit, static_argnames=("cfg",))
        def step_chain(model, opt_state, dstate, cam, tt, tm, tc, n, cfg):
            def body(i, carry):
                m, o, d = carry
                m, o, d, _ = train_step(m, o, d, cam, tt, tm, tc, cfg,
                                        tcfg, tx, 0)
                return (m, o, d)
            return jax.lax.fori_loop(0, n, body, (model, opt_state, dstate))
        return step_chain

    @functools.partial(jax.jit, static_argnames=("cfg", "num_groups"))
    def kernel_chain(records, group_starts, n, cfg, num_groups):
        """N data-chained runs of the bare rasterizer kernel (no projection
        or binning) -- the quantity the roofline models. The int32 add of a
        dynamic 0 defeats loop-invariant code motion without touching the
        (possibly multi-GB) record stream."""
        from intro_to_gaussian_splatting_tpu.ops.rasterize_pallas import (
            rasterize_pairs,
        )

        def body(i, acc):
            gs = group_starts.at[0].add(jnp.int32(acc * 1e-30))
            out = rasterize_pairs(records, gs, num_groups, cfg, interpret)
            return acc + out[0, 0, 0, 0]
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def bin_on_device(model, cam, cfg):
        from intro_to_gaussian_splatting_tpu.ops.binning import bin_gaussians
        from intro_to_gaussian_splatting_tpu.ops.projection import (
            project_gaussians,
        )
        proj = project_gaussians(model, cam, cfg)
        bins = bin_gaussians(proj, cam.width, cam.height, cfg)
        return bins.pair_records, bins.group_starts

    def chain_timed(run, n):
        """Wall time of run(n) completed via a scalar host fetch."""
        t0 = time.perf_counter()
        run(n)
        return time.perf_counter() - t0

    def paired(run, tag, what):
        """(t(2N) - t(N)) / N, retried when host contention makes the
        pair non-monotone (observed: a concurrent CPU-saturating job
        produced t(2N) < t(N), which would otherwise print absurd
        throughput silently). Raises RuntimeError (NOT SystemExit: the
        optional dense workload catches Exception and must not be able
        to sink the headline numbers)."""
        for attempt in range(3):
            t1 = chain_timed(run, iters)
            t2 = chain_timed(run, 2 * iters)
            log(f"[{tag}] raw chain times ({what}, try {attempt}): "
                f"{t1:.2f}/{t2:.2f} s")
            if t2 > t1 * 1.2:
                return (t2 - t1) / iters
        raise RuntimeError(
            f"bench timing unstable for {what}: t(2N) !> t(N) after 3 "
            f"tries -- is another job saturating the host?")

    class Workload:
        """Compile/dispatch phase split from the timing phase so all
        compilation overlaps the background fetch warm-up."""

        def __init__(self, tag, model, cfg, with_kernel=True):
            self.tag, self.model, self.cfg = tag, model, cfg
            self.with_kernel = with_kernel
            tx, self.opt_state, self.dstate = setup_train(model)
            self.step_chain = make_step_chain(tx)
            ntx, nty = tile_grid(width, height, cfg.tile_size)
            self.num_groups = num_groups_for(ntx * nty, cfg)
            self.bins_box = [None]
            if fused:
                # fused loss: only the padded target; its layout depends on
                # (tile_size, H, W) alone, so every cfg shares target_pad
                self.target_tiles, self.target_mask = None, None
                self.target_img = target_pad
            elif (cfg.tile_size, cfg.group_tiles) == (config.tile_size,
                                                      config.group_tiles):
                # split path: the tile layout depends on (tile_size,
                # group_tiles); a cfg that changes either needs its own
                # target tiling
                self.target_tiles, self.target_mask = target_tiles, target_mask
                self.target_img = target_chw
            else:
                self.target_tiles = jax.jit(
                    image_to_tiles, static_argnames="config")(target, cfg)
                self.target_mask = tile_pixel_mask(height, width, cfg)
                self.target_img = target_chw

        def run_fwd(self, n):
            return host_fetch_scalar(
                fwd_chain(self.model, cam, jnp.int32(n), self.cfg))

        def run_kernel(self, n):
            if self.bins_box[0] is None:
                self.bins_box[0] = bin_on_device(self.model, cam, self.cfg)
            records, group_starts = self.bins_box[0]
            return host_fetch_scalar(
                kernel_chain(records, group_starts, jnp.int32(n), self.cfg,
                             self.num_groups))

        def run_step(self, n):
            out = self.step_chain(self.model, self.opt_state, self.dstate,
                                  cam, self.target_tiles, self.target_mask,
                                  self.target_img, jnp.int32(n), self.cfg)
            return host_fetch_scalar(out[0].means[0, 0])

        def compile_all(self, strict=True):
            """Trace+compile every graph and enqueue one async warm run of
            each; returns without any host fetch (nothing blocks on the
            cross-backend channel). With ``strict=False`` a phase that
            fails to compile (e.g. the honest-dense step exceeding the
            memory ceiling) is skipped instead of sinking the others."""
            self.compiled = set()

            def phase(name, fn):
                try:
                    log(f"[{self.tag}] compiling {name} ...")
                    fn()
                    self.compiled.add(name)
                except Exception as e:
                    if strict:
                        raise
                    log(f"[{self.tag}] {name} compile FAILED "
                        f"({type(e).__name__}); skipping that phase")

            phase("fwd", lambda: fwd_chain(self.model, cam, jnp.int32(1),
                                           self.cfg))
            step_name = ("step (fused tile-space L1+SSIM + Adam)" if fused
                         else "step (tile L1 + fused SSIM + Adam)")
            phase(step_name, lambda:
                  self.step_chain(self.model, self.opt_state, self.dstate,
                                  cam, self.target_tiles, self.target_mask,
                                  self.target_img, jnp.int32(1), self.cfg))
            if step_name in self.compiled:
                self.compiled.add("step")
            if self.with_kernel:
                def _k():
                    self.bins_box[0] = bin_on_device(self.model, cam,
                                                     self.cfg)
                    records, group_starts = self.bins_box[0]
                    kernel_chain(records, group_starts, jnp.int32(1),
                                 self.cfg, self.num_groups)
                phase("kernel", _k)
            log(f"[{self.tag}] graphs compiled: {sorted(self.compiled)}")

        def time_all(self, strict=True):
            """Chain-time fwd / kernel / step; requires warm fetch path.

            The pre-binned record stream for the bare-kernel timing can be
            ~2 GB at honest dense pair counts; it is freed before the step
            timing so the step graph gets its full peak memory."""
            tag = self.tag

            def timed(name, run):
                if name not in self.compiled:
                    return None
                try:
                    return paired(run, tag, name)
                except Exception as e:
                    if strict:
                        raise
                    log(f"[{tag}] {name} timing FAILED "
                        f"({type(e).__name__}: {e})")
                    return None

            fwd_s = timed("fwd", self.run_fwd)
            kernel_s = None
            if self.with_kernel:
                kernel_s = timed("kernel", self.run_kernel)
                self.bins_box[0] = None   # free ~2 GB before the step graph
            step_s = timed("step", self.run_step)
            fmsg = (f"fwd {fwd_s*1e3:.1f} ms ({mpix/fwd_s:.1f} Mpix/s) | "
                    if fwd_s is not None else "")
            kmsg = (f"raster kernel {kernel_s*1e3:.1f} ms | "
                    if kernel_s is not None else "")
            smsg = (f"train_step {step_s*1e3:.1f} ms "
                    f"({mpix/step_s:.1f} Mpix/s)"
                    if step_s is not None else "train_step n/a")
            log(f"[{tag}] {fmsg}{kmsg}{smsg}")
            return dict(fwd_s=fwd_s, step_s=step_s, kernel_s=kernel_s)

    def roofline_ratio(num_pairs, cfg, kernel_s):
        """measured bare-kernel ms vs analytic bound on this chip."""
        if num_pairs is None or kernel_s is None:
            return None, None
        ntx, nty = tile_grid(width, height, cfg.tile_size)
        rf = rasterizer_roofline(num_pairs, cfg.tile_size,
                                 cfg.chunk_size, ntx * nty,
                                 cfg.group_tiles,
                                 accum_precision=cfg.accum_precision)
        peak = TPU_PEAKS.get("v5e")
        return kernel_s / rf.bound(*peak), rf.binding(*peak)

    # --- parity gate: compiled Mosaic vs interpret ON THE CHIP ----------
    # Runs (and logs its verdict) BEFORE any timing: a mis-compiled kernel
    # must fail the bench, not publish a fast wrong number, and a later
    # timeout must still leave correctness evidence in stderr. (Same check,
    # at larger scale, lives in tests/test_tpu.py.)
    gate_state = {}

    def parity_gate_compile(gate_cfg=None):
        """Trace+compile+dispatch the gate graphs; no host fetch yet."""
        if backend != "tpu":
            return None  # interpret IS the execution mode off-TPU
        gate_cfg = gate_cfg or config
        from tests.scenes import small_scene

        _, pcam, pmodel = small_scene(n=1000, width=256, height=192, seed=11,
                                      scale_lo=0.01, scale_hi=0.12)
        mask_p = tile_pixel_mask(192, 256, gate_cfg)

        def loss_p(params, interpret):
            from intro_to_gaussian_splatting_tpu.ops.rasterize_pallas import (
                render_tiles,
            )
            tiles = render_tiles(pmodel.replace(**params), pcam, gate_cfg,
                                 interpret=interpret)
            return jnp.sum((tiles[:, :3] * mask_p) ** 2), tiles

        pp = pmodel.params()
        (lc, tc), gc = jax.jit(jax.value_and_grad(
            functools.partial(loss_p, interpret=False), has_aux=True))(pp)
        (li, ti), gi = jax.jit(jax.value_and_grad(
            functools.partial(loss_p, interpret=True), has_aux=True))(pp)

        @jax.jit
        def diffs(tc, ti, gc, gi):
            td = jnp.max(jnp.abs(tc - ti))
            gd = jnp.array([jnp.max(jnp.abs(gc[k] - gi[k])) /
                            jnp.maximum(jnp.max(jnp.abs(gi[k])), 1e-3)
                            for k in gc]).max()
            return jnp.stack([td, gd, jnp.max(jnp.abs(tc))])

        return diffs(tc, ti, gc, gi), gate_cfg

    def parity_gate_check(compiled):
        """Fetch the three scalars and assert (requires warm fetch path)."""
        if compiled is None:
            return
        d, gate_cfg = compiled
        tile_diff = host_fetch_scalar(d[0])
        grad_rel = host_fetch_scalar(d[1])
        mag = host_fetch_scalar(d[2])
        log(f"parity gate (gt={gate_cfg.group_tiles}, "
            f"accum={gate_cfg.accum_precision}): tile maxdiff "
            f"{tile_diff:.2e}, grad rel maxdiff {grad_rel:.2e}, "
            f"|out| {mag:.3f}")
        assert mag > 0.1, "parity gate scene degenerate"
        assert tile_diff < 1e-4, \
            f"COMPILED KERNEL MISMATCH: tiles {tile_diff}"
        assert grad_rel < 1e-3, \
            f"COMPILED KERNEL MISMATCH: grads {grad_rel}"
        log("parity gate: PASS (compiled Mosaic == interpret on chip)")

    # --- fused-loss gate: compiled band kernel vs interpret ON THE CHIP --
    def fused_gate_compile():
        """Compiled fused photometric loss (value+grad) vs interpret, at a
        small scale; compiled in phase 1, checked before any timing."""
        if backend != "tpu" or not fused:
            return None
        from intro_to_gaussian_splatting_tpu.ops.fused_loss_pallas import (
            fused_photometric_loss, pad_target_chw,
        )
        h, w = 192, 331
        ntx_g, nty_g = tile_grid(w, h, config.tile_size)
        ng_g = num_groups_for(ntx_g * nty_g, config)
        key = jax.random.PRNGKey(5)
        k1, k2 = jax.random.split(key)
        tiles_g = jax.random.uniform(
            k1, (ng_g, 3, config.group_tiles, config.tile_size ** 2))
        timg = jax.random.uniform(k2, (h, w, 3), jnp.float32)
        tp = jax.jit(pad_target_chw, static_argnums=(1, 2, 3, 4, 5))(
            timg, ntx_g, nty_g, config.tile_size, h, w)

        def lg(interp):
            def f(t):
                loss, mse = fused_photometric_loss(
                    t, tp, ntx_g, nty_g, config.tile_size, h, w,
                    tcfg.ssim_weight, interp)
                return loss, mse
            (l, m), g = jax.jit(jax.value_and_grad(f, has_aux=True))(tiles_g)
            return l, m, g

        lc, mc, gc = lg(False)
        li, mi, gi = lg(True)

        @jax.jit
        def diffs(lc, mc, gc, li, mi, gi):
            return jnp.stack([
                jnp.abs(lc - li), jnp.abs(mc - mi),
                jnp.max(jnp.abs(gc - gi)), jnp.max(jnp.abs(gi))])
        return diffs(lc, mc, gc, li, mi, gi)

    def fused_gate_check(compiled):
        if compiled is None:
            return
        dl = host_fetch_scalar(compiled[0])
        dm = host_fetch_scalar(compiled[1])
        dg = host_fetch_scalar(compiled[2])
        mag = host_fetch_scalar(compiled[3])
        log(f"fused-loss gate: loss diff {dl:.2e}, mse diff {dm:.2e}, "
            f"grad maxdiff {dg:.2e} (grad scale {mag:.2e})")
        assert dl < 1e-5, f"COMPILED FUSED LOSS MISMATCH: loss {dl}"
        assert dm < 1e-5, f"COMPILED FUSED LOSS MISMATCH: mse {dm}"
        assert dg < 1e-4 * max(mag, 1e-3), \
            f"COMPILED FUSED LOSS MISMATCH: grads {dg}"
        log("fused-loss gate: PASS (compiled band kernel == interpret)")

    def pair_demand(model, tag):
        try:
            return _count_pairs_on_cpu(model, cam, config)
        except Exception as e:  # never let the roofline sink the bench
            log(f"[{tag}] pair-demand count failed: {e!r}")
            return None

    # ================= phase 1: compile everything (warm-up overlapped) ==
    log("phase 1: compiling gate + ref-init graphs "
        "(fetch warm-up running in background)")
    gate_compiled = parity_gate_compile()
    fused_gate_compiled = fused_gate_compile()
    model_ref = init_from_points(xyz, rgb)
    wl_ref = Workload("ref-init", model_ref, config)
    wl_ref.compile_all()
    # CPU-side pair count for the roofline: pure host work, also overlaps
    pairs_ref = pair_demand(model_ref, "ref-init")
    log(f"[ref-init] pair demand (CPU count): {pairs_ref}")

    def make_l1_runner():
        """L1-only train step (ssim_weight=0): the r02-comparable workload
        (r02's 970.7 Mpix/s predates the SSIM term in the headline step)."""
        import dataclasses as _dc0
        tcfg_l1 = _dc0.replace(tcfg, ssim_weight=0.0)
        tx = make_optimizer(tcfg_l1, 10.0)
        opt_state = tx.init(model_ref.params())
        dstate = D.DensifyState.zero(model_ref.capacity)

        @functools.partial(jax.jit, static_argnames=("cfg",))
        def chain(model, opt_state, dstate, cam, tt, tm, n, cfg):
            def body(i, carry):
                m, o, d = carry
                m, o, d, _ = train_step(m, o, d, cam, tt, tm, None,
                                        cfg, tcfg_l1, tx, 0)
                return (m, o, d)
            return jax.lax.fori_loop(0, n, body,
                                     (model, opt_state, dstate))

        def run(n):
            out = chain(model_ref, opt_state, dstate, cam, target_tiles,
                        target_mask, jnp.int32(n), config)
            return host_fetch_scalar(out[0].means[0, 0])
        return run

    # ================= phase 2: gate, then time, then PUBLISH ===========
    join_warm()
    parity_gate_check(gate_compiled)
    fused_gate_check(fused_gate_compiled)
    log("phase 2: timing ref-init workload ...")
    ref = wl_ref.time_all()
    # the r02-comparable number rides IN the headline JSON when the budget
    # allows its (one extra) compile; otherwise it lands in stderr extras
    l1_s = None
    if elapsed() < EXTRA_STAGE_DEADLINE - 200:
        try:
            run_l1 = make_l1_runner()
            log("[l1-step] compiling L1-only train step ...")
            run_l1(1)
            l1_s = paired(run_l1, "l1-step", "step")
            log(f"[l1-step] L1-only train step {l1_s*1e3:.1f} ms "
                f"({mpix/l1_s:.1f} Mpix/s) -- r02-comparable workload")
        except Exception as e:
            log(f"[l1-step] FAILED pre-headline ({type(e).__name__}: {e})")
    ratio_ref, bind_ref = roofline_ratio(pairs_ref, config, ref["kernel_s"])
    if ratio_ref is not None:
        log(f"roofline (bare raster kernel vs analytic bound, v5e): "
            f"ref-init {pairs_ref} pairs, {ratio_ref:.2f}x "
            f"({bind_ref}-bound)")

    baseline_mpix_s = 6.8  # reference CUDA forward-only (BASELINE.md)
    value = mpix / ref["step_s"]
    result = {
        "metric": ("full train step (fwd+bwd+SSIM+Adam) Mpix/s/chip @ "
                   "treehill scale (52k gaussians, 16.8 Mpix)"),
        "value": round(value, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(value / baseline_mpix_s, 2),
        "fwd_mpix_s": round(mpix / ref["fwd_s"], 2),
        "roofline_fwd_ratio_ref": (round(ratio_ref, 3)
                                   if ratio_ref is not None else None),
        "roofline_binding_ref": bind_ref,
        "raster_kernel_ms_ref": (round(ref["kernel_s"] * 1e3, 3)
                                 if ref["kernel_s"] is not None else None),
        "ref_pairs": pairs_ref,
        "l1_step_mpix_s": (round(mpix / l1_s, 2) if l1_s else None),
        "loss_path": "fused" if fused else "split",
        "parity_gate": "pass" if backend == "tpu" else "n/a (interpret)",
    }
    print(json.dumps(result), flush=True)
    log(f"headline JSON published at t={elapsed():.0f}s; everything below "
        f"is best-effort extras (stderr only)")

    # ================= phase 3: best-effort extras (stderr only) ========
    def ssim_gate():
        """Compiled fused-SSIM vs interpret on the chip (value + grad)."""
        if backend != "tpu":
            return
        from intro_to_gaussian_splatting_tpu.ops.ssim_pallas import (
            fused_ssim,
        )
        key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        p = jax.random.uniform(k1, (3, 211, 331), jnp.float32)
        t = jax.random.uniform(k2, (3, 211, 331), jnp.float32)

        def vg(interp):
            f = lambda x: fused_ssim(x, t, interpret=interp,
                                     grad_target=False)
            return jax.jit(jax.value_and_grad(f))(p)

        vc, gc = vg(False)
        vi, gi = vg(True)
        dv = host_fetch_scalar(jnp.abs(vc - vi))
        dg = host_fetch_scalar(jnp.max(jnp.abs(gc - gi)))
        log(f"ssim gate: value diff {dv:.2e}, grad maxdiff {dg:.2e}")
        assert dv < 1e-5, f"COMPILED SSIM MISMATCH: value {dv}"
        assert dg < 1e-4, f"COMPILED SSIM MISMATCH: grads {dg}"
        log("ssim gate: PASS")

    def relayout_gate():
        """Compiled Pallas untile (relayout_pallas) vs the XLA reference
        permutation, on the chip, small shape."""
        if backend != "tpu":
            return
        from intro_to_gaussian_splatting_tpu.ops.rasterize_pallas import (
            untile_chw,
        )
        from intro_to_gaussian_splatting_tpu.ops.relayout_pallas import (
            untile_chw_fast,
        )
        ts, gt, h, w = config.tile_size, config.group_tiles, 192, 256
        ntx, nty = tile_grid(w, h, ts)
        ng = -(-(ntx * nty) // gt)
        t = jax.random.normal(jax.random.PRNGKey(2),
                              (ng, 4, gt, ts * ts), jnp.float32)

        @jax.jit
        def diff(t):
            a = untile_chw_fast(t, ntx, nty, ts, h, w, False)
            b = untile_chw(t[:, :3], ntx, nty, ts, h, w)
            ga = jax.grad(lambda x: jnp.sum(
                untile_chw_fast(x, ntx, nty, ts, h, w, False) ** 2))(t)
            gb = jax.grad(lambda x: jnp.sum(
                untile_chw(x[:, :3], ntx, nty, ts, h, w) ** 2))(t)
            return jnp.max(jnp.abs(a - b)) + jnp.max(jnp.abs(ga - gb))
        d = host_fetch_scalar(diff(t))
        log(f"relayout gate: fwd+grad maxdiff {d:.2e}")
        assert d == 0.0, f"PALLAS RELAYOUT MISMATCH: {d}"
        log("relayout gate: PASS")

    if extras_allowed("ssim-gate"):
        try:
            ssim_gate()
        except Exception as e:
            log(f"[ssim-gate] FAILED ({type(e).__name__}: {e})")
    if extras_allowed("relayout-gate"):
        try:
            relayout_gate()
        except Exception as e:
            log(f"[relayout-gate] FAILED ({type(e).__name__}: {e})")

    # fallback: pre-headline budget was too tight for the extra compile
    if l1_s is None and extras_allowed("l1-step"):
        try:
            run_l1 = make_l1_runner()
            log("[l1-step] compiling L1-only train step ...")
            run_l1(1)
            l1_s = paired(run_l1, "l1-step", "step")
            log(f"[l1-step] L1-only train step {l1_s*1e3:.1f} ms "
                f"({mpix/l1_s:.1f} Mpix/s) -- r02-comparable workload")
        except Exception as e:
            log(f"[l1-step] FAILED ({type(e).__name__}: {e})")

    # Dense-knn workload: paper-correct 3-NN mean-distance scales (what
    # training actually produces) -- a dense pair stream whose demand is
    # ~100x the default pool (fat splats span hundreds of tiles). Size the
    # pool to hold ALL of it so the number is honest-dense, and shrink the
    # tile group (the one-hot accumulation matmul cost scales with
    # group_tiles, which dominates at this density). This probes the chip's
    # memory ceiling and must NEVER sink the published headline -- it runs
    # strictly after the JSON line, guarded, stderr-only.
    import dataclasses as _dc
    if extras_allowed("knn-dense"):
        try:
            model_knn = init_from_points(xyz, rgb, scale_init=None,
                                         opacity=0.9)
            pairs_knn = pair_demand(model_knn, "knn-init")
            config_knn = config
            if pairs_knn is not None:
                # Round 4 capped the pool at 16M pairs (58% of demand)
                # because the backward exceeded the chip's HLO-temp
                # ceiling. Round 5's lean feature-major backward (gradient
                # rows only + no fine_ex copy, ops/binning.py) cut the peak
                # by ~40%, so the default cap now admits the FULL ~29M-pair
                # demand; the env knob remains as the fallback if a future
                # workload needs a smaller pool.
                pair_cap = int(os.environ.get("GSTPU_KNN_PAIR_CAP",
                                              32 << 20))
                ppg = -(-min(int(pairs_knn * 1.05), pair_cap) // n_gauss)
                # small groups cut the one-hot matmul cost that dominates at
                # this density; batch more of them per grid step so the
                # sequential step overhead (~3us) stays amortized
                config_knn = _dc.replace(config,
                                         pairs_per_gaussian=max(ppg, 4),
                                         group_tiles=16, groups_per_step=16)
                pool = config_knn.pairs_per_gaussian * n_gauss
                log(f"[knn-init] {pairs_knn} pairs demanded -> pool "
                    f"pairs_per_gaussian={config_knn.pairs_per_gaussian} "
                    f"({min(100.0, 100.0 * pool / pairs_knn):.0f}% of "
                    f"demand; far tail beyond that dropped), group_tiles=16 "
                    f"(the default pool would keep only "
                    f"{100.0 * config.pairs_per_gaussian * n_gauss / pairs_knn:.1f}%)")
            if config_knn is not config and backend == "tpu":
                # different kernel variant: gate it before timing it
                parity_gate_check(parity_gate_compile(
                    _dc.replace(config, group_tiles=config_knn.group_tiles,
                                groups_per_step=config_knn.groups_per_step,
                                accum_precision=config_knn.accum_precision)))
            wl_knn = Workload("knn-init", model_knn, config_knn)
            wl_knn.compile_all(strict=False)
            if extras_allowed("knn-dense-timing"):
                knn = wl_knn.time_all(strict=False)
                ratio_knn, bind_knn = roofline_ratio(pairs_knn, config_knn,
                                                     knn["kernel_s"])
                if ratio_knn is not None:
                    log(f"roofline: knn-init {pairs_knn} pairs, "
                        f"{ratio_knn:.2f}x ({bind_knn}-bound)")
                log("[knn-init] extras summary: "
                    + json.dumps({
                        "knn_init_step_mpix_s":
                            (round(mpix / knn["step_s"], 2)
                             if knn["step_s"] else None),
                        "knn_init_fwd_mpix_s":
                            (round(mpix / knn["fwd_s"], 2)
                             if knn["fwd_s"] else None),
                        "roofline_fwd_ratio_knn":
                            (round(ratio_knn, 3) if ratio_knn is not None
                             else None),
                        "knn_pairs": pairs_knn,
                        "knn_pool_pairs_per_gaussian":
                            config_knn.pairs_per_gaussian,
                        "raster_kernel_ms_knn":
                            (round(knn["kernel_s"] * 1e3, 3)
                             if knn["kernel_s"] else None),
                    }))
        except BaseException as e:
            # the honest-dense pool is ~150x the training workload's and
            # probes the chip's memory ceiling; it may die in ANY way
            # (OOM, RuntimeError from paired, remote-compile rejection)
            # without consequence for the already-published headline
            log(f"[knn-init] FAILED ({type(e).__name__}: {e}); "
                f"headline already published")


if __name__ == "__main__":
    main()
