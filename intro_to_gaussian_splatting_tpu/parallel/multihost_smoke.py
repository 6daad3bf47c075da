"""Two-process `jax.distributed` smoke: the full sharded train step across
process boundaries.

Run one copy per "host" (CPU Gloo collectives stand in for ICI/DCN):

    python -m intro_to_gaussian_splatting_tpu.parallel.multihost_smoke \
        <process_id> <num_processes> <coordinator host:port>

Each process: joins the runtime, builds the GLOBAL gauss x tiles mesh over
every process's devices, loads ONLY its own strip rows of the target
(parallel.multihost.globalize_target -- the per-host data path), and runs
`sharded_train_step` (ppermute ring binning + probe gradients + Adam).
Prints one line: `SMOKE pid=<i> losses=<l0>,<l1>,<l2> psnr=<p>` -- every
process must print identical numbers (the loss is a psum-replicated
scalar), which tests/test_multihost.py asserts.

The reference has no distributed execution of any kind (SURVEY.md
section 2.3); this is the BASELINE config-5 entry surface exercised at
2 processes.
"""

from __future__ import annotations

import os
import sys


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    pid, nproc, coordinator = int(argv[0]), int(argv[1]), argv[2]

    # one virtual 2-device CPU "host" per process; must precede backend init
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2").strip()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from intro_to_gaussian_splatting_tpu.parallel.multihost import (
        global_mesh, globalize_target, init_multihost, process_local_rows,
        put_global_tree,
    )
    init_multihost(coordinator=coordinator, num_processes=nproc,
                   process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as PS

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
    from intro_to_gaussian_splatting_tpu.parallel.mesh import GAUSS_AXIS
    from intro_to_gaussian_splatting_tpu.parallel.sharded import (
        sharded_train_step, strip_layout,
    )
    from intro_to_gaussian_splatting_tpu.train import densify as D
    from intro_to_gaussian_splatting_tpu.train.trainer import make_optimizer

    # deterministic tiny scene, identical on every process
    n, width, height = 64, 64, 64
    xyz, rgb = random_point_cloud(n, seed=7, extent=2.0)
    qvec, tvec = ring_cameras(1, width, height, radius=4.0, seed=7)[0]
    cam = make_camera(fx=0.9 * width, fy=0.9 * width, width=width,
                      height=height, qvec=qvec, tvec=tvec)
    rcfg = RasterizerConfig(pairs_per_gaussian=32, group_tiles=2)
    tcfg = TrainConfig(ssim_weight=0.0)

    true_model = init_from_points(xyz, rgb, scale_init=0.12, opacity=0.8)
    target = np.asarray(render_tiled(true_model, cam, rcfg, interpret=True))

    mesh = global_mesh(n_gauss_shards=2)
    n_strips = mesh.devices.size
    strip_rows, padded_h = strip_layout(height, rcfg.tile_size, n_strips)
    row0, rows = process_local_rows(height, rcfg.tile_size, mesh)
    pad = np.zeros((padded_h, width, 3), np.float32)
    pad[:height] = target
    target_global = globalize_target(pad[row0:row0 + rows], padded_h, mesh)

    noisy = true_model.replace(
        sh=true_model.sh
        + 0.25 * jax.random.normal(jax.random.PRNGKey(3),
                                   true_model.sh.shape))
    model = put_global_tree(noisy, mesh, PS(GAUSS_AXIS))
    tx = make_optimizer(tcfg, scene_extent=2.0)
    opt_state = jax.jit(tx.init)(model.params())
    dstate = put_global_tree(D.DensifyState.zero(model.capacity), mesh,
                             PS(GAUSS_AXIS))
    cam_g = put_global_tree(cam, mesh, PS())

    losses = []
    for _ in range(3):
        model, opt_state, dstate, metrics = sharded_train_step(
            model, opt_state, dstate, cam_g, target_global, mesh, rcfg,
            tcfg, tx, interpret=True)
        losses.append(float(np.asarray(
            metrics["loss"].addressable_data(0))))
    psnr = float(np.asarray(metrics["psnr"].addressable_data(0)))
    print(f"SMOKE pid={pid} losses=" +
          ",".join(f"{l:.6f}" for l in losses) + f" psnr={psnr:.4f}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
