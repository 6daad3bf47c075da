"""Training-loop tests: loss decreases, densify/prune bookkeeping, checkpoints."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from intro_to_gaussian_splatting_tpu.config import RasterizerConfig, TrainConfig
from intro_to_gaussian_splatting_tpu.models.gaussians import GaussianModel
from intro_to_gaussian_splatting_tpu.ops.rasterize_pallas import render_tiled
from intro_to_gaussian_splatting_tpu.train import densify as D
from intro_to_gaussian_splatting_tpu.train.loss import psnr, rgb_loss, ssim
from intro_to_gaussian_splatting_tpu.train.trainer import (
    Trainer, scene_extent_of,
)
from tests.scenes import small_scene

RCFG = RasterizerConfig(chunk_size=128, pairs_per_gaussian=32, group_tiles=2)


def test_ssim_identity_and_range(rng):
    img = jnp.asarray(rng.uniform(0, 1, size=(32, 32, 3)), jnp.float32)
    assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-5)
    noise = jnp.asarray(rng.uniform(0, 1, size=(32, 32, 3)), jnp.float32)
    v = float(ssim(img, noise))
    assert -1.0 <= v < 0.9


def test_psnr_scale(rng):
    a = jnp.zeros((8, 8, 3))
    b = jnp.full((8, 8, 3), 0.1)
    assert float(psnr(a, b)) == pytest.approx(20.0, abs=1e-3)


def test_training_improves_psnr():
    """Optimize a perturbed model toward images of the true model."""
    raw, cam, true_model = small_scene(n=40, width=32, height=32, seed=21,
                                       scale_lo=0.08, scale_hi=0.3)
    target = render_tiled(true_model, cam, RCFG, interpret=True)

    key = jax.random.PRNGKey(0)
    noisy = true_model.replace(
        sh=true_model.sh + 0.3 * jax.random.normal(key, true_model.sh.shape),
        opacity_logits=true_model.opacity_logits - 1.0,
    )
    tcfg = TrainConfig(iterations=25, densify_start=10 ** 9,
                       opacity_reset_interval=0, ssim_weight=0.0)
    trainer = Trainer(model=noisy, cameras=[cam], targets=[target],
                      scene_extent=scene_extent_of(np.asarray(raw["points"])),
                      rcfg=RCFG, tcfg=tcfg, log_every=5)
    hist = trainer.run(25)
    first, last = hist[0], hist[-1]
    assert last["loss"] < first["loss"] * 0.9, hist
    assert last["psnr"] > first["psnr"] + 0.5, hist


def test_sh_lr_split():
    """DC SH coefficients step at lr_sh0, rest bands at lr_shN = lr_sh0/20
    (config.py lr_shN; 3DGS paper trains rest at /20). Adam normalizes the
    first update to ~sign(g), so the update magnitude IS the effective
    learning rate."""
    from intro_to_gaussian_splatting_tpu.train.trainer import make_optimizer

    raw, cam, model = small_scene(n=8, width=16, height=16, seed=12)
    sh = jnp.concatenate([model.sh, 0.1 * jnp.ones((8, 8, 3))], axis=1)
    model = model.replace(sh=sh, color_space="sh")
    tcfg = TrainConfig()
    assert tcfg.lr_shN != tcfg.lr_sh0
    tx = make_optimizer(tcfg, scene_extent=1.0)
    state = tx.init(model.params())
    grads = jax.tree.map(jnp.ones_like, model.params())
    updates, _ = tx.update(grads, state, model.params())
    up = np.asarray(updates["sh"])
    np.testing.assert_allclose(up[:, 0, :], -tcfg.lr_sh0, rtol=1e-4)
    np.testing.assert_allclose(up[:, 1:, :], -tcfg.lr_shN, rtol=1e-4)


def test_trainer_grows_pair_pool_on_overflow():
    """Overflow response policy: a pair pool too small for the scene is
    detected (aux.overflowed), doubled by the Trainer, and a later step
    runs clean -- geometry drops are a transient, not a steady state."""
    raw, cam, true_model = small_scene(n=60, width=32, height=32, seed=21,
                                       scale_lo=0.15, scale_hi=0.5)
    target = render_tiled(true_model, cam, RCFG, interpret=True)
    tiny = RasterizerConfig(chunk_size=128, pairs_per_gaussian=1,
                            group_tiles=2)
    tcfg = TrainConfig(iterations=8, densify_start=10 ** 9,
                       opacity_reset_interval=0, ssim_weight=0.0)
    events = []
    trainer = Trainer(model=true_model, cameras=[cam], targets=[target],
                      scene_extent=1.0, rcfg=tiny, tcfg=tcfg, log_every=1,
                      on_log=lambda m: events.append(m))
    trainer.run(8)
    overflow_steps = [m for m in events if m.get("overflowed")]
    grow_events = [m for m in events if m.get("event") == "pair_pool_grown"]
    assert overflow_steps, "big splats vs pairs_per_gaussian=1 must overflow"
    assert grow_events, "Trainer must respond to overflow by growing the pool"
    assert trainer.rcfg.pairs_per_gaussian > 1
    assert not events[-1].get("overflowed"), \
        f"pool still overflowing after growth: {events[-1]}"


def test_densify_clone_and_split():
    raw, cam, model = small_scene(n=30, width=32, height=32, seed=3)
    cap = 64
    # embed in a larger pool
    def pad(x, fill=0.0):
        return jnp.concatenate(
            [x, jnp.full((cap - x.shape[0],) + x.shape[1:], fill, x.dtype)])
    model = GaussianModel(
        means=pad(model.means), log_scales=pad(model.log_scales, -10.0),
        quats=pad(model.quats).at[30:, 0].set(1.0),
        opacity_logits=pad(model.opacity_logits, -20.0),
        sh=pad(model.sh), active=pad(model.active, False),
        color_space="rgb")
    state = D.DensifyState(
        grad_accum=jnp.where(model.active, 1.0, 0.0),  # all above threshold
        count=jnp.ones((cap,), jnp.int32))
    tcfg = TrainConfig(densify_grad_threshold=1e-4,
                       densify_scale_threshold=0.01)
    new_model, slots = D.densify(model, state, jax.random.PRNGKey(0), tcfg,
                                 scene_extent=1.0, max_new=16)
    assert int(new_model.num_active) == 30 + 16
    written = np.asarray(slots)
    assert (written[np.asarray(slots) < cap] >= 30).all(), \
        "new gaussians must land in free slots"
    # split sources shrank
    src_scales = np.exp(np.asarray(model.log_scales[:30]))
    new_scales = np.exp(np.asarray(new_model.log_scales[:30]))
    assert (new_scales <= src_scales + 1e-6).all()


def test_densify_respects_capacity():
    raw, cam, model = small_scene(n=20, width=32, height=32, seed=5)
    state = D.DensifyState(
        grad_accum=jnp.ones((20,)), count=jnp.ones((20,), jnp.int32))
    tcfg = TrainConfig(densify_grad_threshold=1e-6)
    # pool is full: nothing can be added, nothing crashes
    new_model, slots = D.densify(model, state, jax.random.PRNGKey(1), tcfg,
                                 scene_extent=1.0, max_new=8)
    assert int(new_model.num_active) == 20
    assert (np.asarray(slots) == 20).all()


def test_prune_and_opacity_reset():
    raw, cam, model = small_scene(n=25, width=32, height=32, seed=6)
    model = model.replace(
        opacity_logits=model.opacity_logits.at[:5].set(-10.0))
    tcfg = TrainConfig()
    pruned = D.prune(model, tcfg, scene_extent=10.0)
    assert int(pruned.num_active) == 20
    reset = D.reset_opacity(model)
    op = np.asarray(jax.nn.sigmoid(reset.opacity_logits))
    assert (op <= 0.0101).all()


def test_checkpoint_roundtrip(tmp_path):
    from intro_to_gaussian_splatting_tpu.train.checkpoint import (
        load_checkpoint, save_checkpoint,
    )
    from intro_to_gaussian_splatting_tpu.train.trainer import make_optimizer

    raw, cam, model = small_scene(n=15, width=16, height=16, seed=9)
    tx = make_optimizer(TrainConfig(), scene_extent=1.0)
    opt_state = tx.init(model.params())
    save_checkpoint(str(tmp_path / "ck"), model, opt_state, step=42)

    blank = jax.tree.map(jnp.zeros_like, model)
    blank = blank.replace(color_space=model.color_space)
    restored, ropt, step = load_checkpoint(
        str(tmp_path / "ck"), blank, jax.tree.map(jnp.zeros_like, opt_state))
    assert step == 42
    np.testing.assert_array_equal(np.asarray(restored.means),
                                  np.asarray(model.means))
    np.testing.assert_array_equal(np.asarray(restored.active),
                                  np.asarray(model.active))


def test_ply_export_import_roundtrip(tmp_path):
    from intro_to_gaussian_splatting_tpu.train.checkpoint import (
        export_ply, import_ply,
    )
    raw, cam, model = small_scene(n=12, width=16, height=16, seed=10)
    # give it a deg-1 SH to exercise f_rest
    sh = jnp.concatenate(
        [model.sh, 0.1 * jnp.ones((12, 3, 3), jnp.float32)], axis=1)
    model = model.replace(sh=sh, color_space="sh")
    path = str(tmp_path / "gs.ply")
    export_ply(path, model)
    back = import_ply(path)
    np.testing.assert_allclose(np.asarray(back.means),
                               np.asarray(model.means), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(back.sh),
                               np.asarray(model.sh), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(back.quats),
                               np.asarray(model.quats), rtol=1e-6)


def test_camera_batch_equals_mean_gradient():
    """train_step_batched must take ONE optimizer step on the MEAN of the
    per-camera gradients: batching the same camera twice reproduces the
    single-camera step exactly, and a 2-distinct-camera batch equals a
    manual mean-gradient Adam update."""
    import optax

    from intro_to_gaussian_splatting_tpu.config import TrainConfig
    from intro_to_gaussian_splatting_tpu.models.camera import stack_cameras
    from intro_to_gaussian_splatting_tpu.ops.rasterize_pallas import (
        image_to_tiles, tile_pixel_mask,
    )
    from intro_to_gaussian_splatting_tpu.train.trainer import (
        _camera_loss, make_optimizer, train_step, train_step_batched,
    )
    from tests.scenes import small_scene

    raw, cam, true_model = small_scene(n=25, width=32, height=32, seed=4,
                                       scale_lo=0.08, scale_hi=0.3)
    cam2 = small_scene(n=25, width=32, height=32, seed=8)[1]
    t1 = render_tiled(true_model, cam, RCFG, interpret=True)
    t2 = render_tiled(true_model, cam2, RCFG, interpret=True) * 0.5
    # perturb so the loss/gradients are far from zero
    model = true_model.replace(
        opacity_logits=true_model.opacity_logits - 1.0)
    tcfg = TrainConfig(ssim_weight=0.0)
    # a LINEAR optimizer isolates the mean-gradient property: Adam's
    # g/|g| normalization amplifies benign op-order rounding at
    # near-zero gradients into sign flips, which is not what this test
    # is about (train_step_batched applies whatever tx it is given to
    # the accumulated mean either way)
    tx = optax.sgd(1e-2)
    opt_state = tx.init(model.params())
    dstate = D.DensifyState.zero(model.capacity)
    mask = tile_pixel_mask(32, 32, RCFG)

    # same camera twice == single-camera step
    cams = stack_cameras([cam, cam])
    tiles1 = image_to_tiles(t1, RCFG)
    tt = jnp.stack([tiles1, tiles1])
    tm = jnp.stack([mask, mask])
    mb, ob, db, metb = train_step_batched(
        model, opt_state, dstate, cams, tt, tm, None, RCFG, tcfg, tx, 0)
    ms, _, ds, mets = train_step(
        model, opt_state, dstate, cam, tiles1, mask, None, RCFG, tcfg,
        tx, 0)
    # scan-body vs inline graphs compile to slightly different op orders;
    # f32 noise ~2e-5 abs is expected, a sum-vs-mean bug would be ~1e-2
    np.testing.assert_allclose(np.asarray(mb.means), np.asarray(ms.means),
                               rtol=1e-3, atol=1e-4)
    assert float(metb["loss"]) == pytest.approx(float(mets["loss"]),
                                                rel=1e-5)
    # densify stats accumulate PER CAMERA (twice the single-step stat)
    np.testing.assert_allclose(np.asarray(db.grad_accum),
                               2 * np.asarray(ds.grad_accum),
                               rtol=1e-3, atol=1e-8)

    # two distinct cameras == manual mean-gradient update
    cams2 = stack_cameras([cam, cam2])
    tiles2 = image_to_tiles(t2, RCFG)
    tt2 = jnp.stack([tiles1, tiles2])
    mb2, _, _, _ = train_step_batched(
        model, opt_state, dstate, cams2, tt2, tm, None, RCFG, tcfg, tx, 0)

    params = model.params()
    probe = jnp.zeros((model.capacity, 2), jnp.float32)
    gsum = None
    for c, t in ((cam, tiles1), (cam2, tiles2)):
        g = jax.grad(
            lambda p: _camera_loss(model, p, probe, c, t, mask, None,
                                   RCFG, tcfg, 0)[0])(params)
        gsum = g if gsum is None else jax.tree.map(jnp.add, gsum, g)
    gmean = jax.tree.map(lambda x: x / 2.0, gsum)
    updates, _ = tx.update(gmean, opt_state, params)
    ref = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(mb2.means),
                               np.asarray(ref["means"]),
                               rtol=1e-3, atol=1e-4)


def test_trainer_camera_batch_ragged_groups():
    """camera_batch not dividing the camera count: the last group wraps
    around (deterministic groups, so the stacked-target cache still hits)."""
    from intro_to_gaussian_splatting_tpu.config import TrainConfig
    from tests.scenes import small_scene

    raw, cam, model = small_scene(n=20, width=32, height=32, seed=2)
    cams = [small_scene(n=20, width=32, height=32, seed=s)[1]
            for s in (2, 3, 4)]
    target = np.asarray(render_tiled(model, cam, RCFG, interpret=True))
    tcfg = TrainConfig(iterations=4, densify_start=10 ** 9,
                       opacity_reset_interval=0, ssim_weight=0.0,
                       camera_batch=2)
    trainer = Trainer(model=model, cameras=cams,
                      targets=[target.copy() for _ in cams],
                      scene_extent=1.0, rcfg=RCFG, tcfg=tcfg, log_every=2)
    hist = trainer.run(4)      # 2 groups: (0,1) and (2,0)
    assert np.isfinite(hist[-1]["loss"])
    # exactly ceil(3/2)=2 distinct stacked groups were built and cached
    keys = [k for k in trainer._tiled if isinstance(k, tuple)
            and k and k[0] == "batch"]
    assert sorted(keys) == [("batch", 0, 1), ("batch", 2, 0)], keys


def test_host_fetch_scalars_one_fused_transfer():
    """host_fetch_scalars returns every value as float and preserves the
    dict's keys (the trainer's logging contract)."""
    from intro_to_gaussian_splatting_tpu.utils.fetch import (
        host_fetch_scalars,
    )
    d = dict(a=jnp.float32(1.5), b=jnp.int32(7), c=jnp.asarray(True),
             n=jnp.asarray(-2.25))
    out = host_fetch_scalars(d)
    assert out == {"a": 1.5, "b": 7.0, "c": 1.0, "n": -2.25}
    assert all(isinstance(v, float) for v in out.values())


def test_trainer_runs_camera_batched():
    """Trainer.run with tcfg.camera_batch > 1 optimizes and logs."""
    from intro_to_gaussian_splatting_tpu.config import TrainConfig
    from tests.scenes import small_scene

    raw, cam, true_model = small_scene(n=40, width=32, height=32, seed=21,
                                       scale_lo=0.08, scale_hi=0.3)
    cam2 = small_scene(n=40, width=32, height=32, seed=9)[1]
    t1 = np.asarray(render_tiled(true_model, cam, RCFG, interpret=True))
    t2 = np.asarray(render_tiled(true_model, cam2, RCFG, interpret=True))
    noisy = true_model.replace(
        opacity_logits=true_model.opacity_logits - 1.0)
    tcfg = TrainConfig(iterations=8, densify_start=10 ** 9,
                       opacity_reset_interval=0, ssim_weight=0.0,
                       camera_batch=2)
    trainer = Trainer(model=noisy, cameras=[cam, cam2], targets=[t1, t2],
                      scene_extent=1.0, rcfg=RCFG, tcfg=tcfg, log_every=4)
    hist = trainer.run(8)
    assert hist[-1]["loss"] < hist[0]["loss"], hist
    assert np.isfinite(hist[-1]["psnr"])


def test_checkpoint_listing_ignores_interrupted_saves(tmp_path):
    """An interrupted orbax save leaves step_N.orbax-checkpoint-tmp-<ts>
    dirs behind; resume (the crash-recovery path) must skip them instead
    of crashing on int()."""
    from intro_to_gaussian_splatting_tpu.train.checkpoint import (
        list_checkpoint_steps, load_checkpoint, save_checkpoint,
    )
    from intro_to_gaussian_splatting_tpu.train.trainer import make_optimizer

    raw, cam, model = small_scene(n=10, width=16, height=16, seed=9)
    tx = make_optimizer(TrainConfig(), scene_extent=1.0)
    opt_state = tx.init(model.params())
    ck = tmp_path / "ck"
    save_checkpoint(str(ck), model, opt_state, step=7)
    # stray entries an interrupted run can leave behind
    (ck / "step_9.orbax-checkpoint-tmp-1729").mkdir()
    (ck / "step_").mkdir()
    (ck / "notes.txt").write_text("hi")

    assert list_checkpoint_steps(str(ck)) == [7]
    blank = jax.tree.map(jnp.zeros_like, model).replace(
        color_space=model.color_space)
    _, _, step = load_checkpoint(str(ck), blank,
                                 jax.tree.map(jnp.zeros_like, opt_state))
    assert step == 7


def test_trainer_logging_is_tunnel_safe_and_writes_jsonl(tmp_path,
                                                         monkeypatch):
    """The logging path must go through the fused tunnel-safe fetch (a
    direct float(v) device->host transfer hangs on tunneled transports)
    and append one JSON object per logged row to jsonl_path."""
    import json as json_mod

    from intro_to_gaussian_splatting_tpu.utils import fetch as fetch_mod

    calls = []
    real = fetch_mod.host_fetch_scalars
    monkeypatch.setattr(fetch_mod, "host_fetch_scalars",
                        lambda d: calls.append(set(d)) or real(d))

    raw, cam, model = small_scene(n=20, width=32, height=32, seed=21)
    target = render_tiled(model, cam, RCFG, interpret=True)
    tcfg = TrainConfig(iterations=4, densify_start=10 ** 9,
                       opacity_reset_interval=0, ssim_weight=0.0)
    jsonl = tmp_path / "metrics.jsonl"
    trainer = Trainer(model=model, cameras=[cam], targets=[target],
                      scene_extent=1.0, rcfg=RCFG, tcfg=tcfg, log_every=2,
                      jsonl_path=str(jsonl))
    trainer.run(4)
    assert calls and all("loss" in c for c in calls), \
        "metrics must be fetched through utils.fetch.host_fetch_scalars"
    rows = [json_mod.loads(l) for l in jsonl.read_text().splitlines()]
    assert [r["step"] for r in rows] == [2, 4]
    assert all("loss" in r and "psnr" in r and "overflow_steps" in r
               for r in rows)


def test_trainer_reports_mid_window_overflow():
    """A step that overflows BETWEEN log boundaries must show up in the
    next boundary's overflow_steps count (the device-side counter), even
    though the logged step itself ran clean."""
    raw, cam, true_model = small_scene(n=60, width=32, height=32, seed=21,
                                       scale_lo=0.15, scale_hi=0.5)
    target = render_tiled(true_model, cam, RCFG, interpret=True)
    tiny = RasterizerConfig(chunk_size=128, pairs_per_gaussian=1,
                            group_tiles=2)
    tcfg = TrainConfig(iterations=6, densify_start=10 ** 9,
                       opacity_reset_interval=0, ssim_weight=0.0)
    events = []
    trainer = Trainer(model=true_model, cameras=[cam], targets=[target],
                      scene_extent=1.0, rcfg=tiny, tcfg=tcfg, log_every=3,
                      on_log=lambda m: events.append(m))
    trainer.run(6)
    logs = [m for m in events if "overflow_steps" in m]
    # every step before the first boundary overflowed (pool of 1 pair per
    # gaussian): the whole window is reported, not just the logged step
    assert logs[0]["overflow_steps"] == 3, logs
    assert trainer.rcfg.pairs_per_gaussian > 1


def test_trainer_target_cache_is_bounded():
    """Training over many distinct cameras must not pin every pre-tiled
    target on device: the LRU cache stays within target_cache_bytes."""
    raw, cam, model = small_scene(n=15, width=32, height=32, seed=13)
    target = np.asarray(render_tiled(model, cam, RCFG, interpret=True))
    n_cams = 6
    cams = [cam] * n_cams
    targets = [target.copy() for _ in range(n_cams)]
    tcfg = TrainConfig(iterations=n_cams, densify_start=10 ** 9,
                       opacity_reset_interval=0, ssim_weight=0.0)
    trainer = Trainer(model=model, cameras=cams, targets=targets,
                      scene_extent=1.0, rcfg=RCFG, tcfg=tcfg, log_every=10)
    one_entry = None
    trainer._target_for(0)
    one_entry = trainer._tiled[0][1]
    # budget for ~2 entries: training over 6 cameras must evict
    trainer.target_cache_bytes = 2 * one_entry + 1
    trainer.run(n_cams)
    assert len(trainer._tiled) <= 2
    assert trainer._tiled_bytes <= trainer.target_cache_bytes
    # and training still works after eviction + refill
    assert np.isfinite(trainer.history[-1]["loss"])


def test_evaluate_reports_pair_pool_overflow():
    """evaluate() must surface per-view pair-pool overflow (a densified
    model scored with a too-small pool silently deflates PSNR/SSIM
    otherwise -- gstpu eval prints a loud warning from this field)."""
    import dataclasses

    from intro_to_gaussian_splatting_tpu.config import RasterizerConfig
    from intro_to_gaussian_splatting_tpu.train.evaluate import evaluate
    from tests.scenes import small_scene

    _, cam, model = small_scene(n=200, width=64, height=48, seed=7,
                                scale_lo=0.05, scale_hi=0.4, opacity_hi=4.0)
    target = np.zeros((48, 64, 3), np.float32)

    tiny = dataclasses.replace(RasterizerConfig(), pairs_per_gaussian=1)
    rows = evaluate(model, [cam], [target], tiny)
    assert rows[0]["overflowed"] is True

    big = dataclasses.replace(RasterizerConfig(), pairs_per_gaussian=64)
    rows = evaluate(model, [cam], [target], big)
    assert rows[0]["overflowed"] is False
    assert np.isfinite(rows[0]["psnr"])
