"""Multi-host (multi-process) execution surface.

The reference is strictly single-process (SURVEY.md section 2.3 -- no
distributed code of any kind); this is the BASELINE config-5 path: one
JAX process per TPU host, joined through ``jax.distributed.initialize``,
with the same gauss x tiles mesh spanning every host's devices. Local
(per-host) arrays are lifted into globally-sharded arrays with
``jax.make_array_from_process_local_data``, so each host feeds only its
own shard of targets/gaussians -- no host ever materializes the global
state.

Failure story: the coordination service detects peer loss (heartbeat
timeout) and fails the step collectively; restart-from-checkpoint is the
recovery path (train/checkpoint.py stores the full training state, and
every process restores the same step).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

from intro_to_gaussian_splatting_tpu.parallel.mesh import (
    GAUSS_AXIS, TILE_AXIS, make_mesh,
)


def init_multihost(coordinator: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None,
                   local_device_ids=None) -> None:
    """Join (or form) the multi-process JAX runtime.

    On TPU pods all three arguments auto-detect from the pod metadata;
    on CPU/GPU fleets pass them explicitly (one process per host):

        gstpu train --multihost --coordinator host0:1234 \
            --num-processes 2 --process-id $RANK ...

    Safe to call once per process, before any other JAX API touches the
    backend. No-op if the runtime is already initialized (e.g. tests).
    """
    if jax.distributed.is_initialized():
        return  # note: jax.process_count() would itself init the backend
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:  # pragma: no cover - single-host fallback
        if "already initialized" not in str(e):
            raise


def global_mesh(n_gauss_shards: Optional[int] = None,
                n_tile_shards: Optional[int] = None) -> Mesh:
    """Mesh over ALL devices of ALL processes (jax.devices() is global
    after ``init_multihost``). Axis order puts the gauss axis outermost so
    each host's local devices form contiguous tile shards -- ring
    ppermutes along "gauss" then cross hosts over DCN only
    process_count times per step, while the tile-axis collectives stay on
    ICI."""
    return make_mesh(n_gauss_shards, n_tile_shards, devices=jax.devices())


def process_local_rows(height: int, tile_size: int, mesh: Mesh) -> Tuple[int, int]:
    """(row0, rows) of the padded image strip this PROCESS owns under the
    PS((gauss, tiles)) row sharding used by sharded_train_step. Hosts load
    and decode only their own target rows."""
    from intro_to_gaussian_splatting_tpu.parallel.sharded import strip_layout

    n_strips = mesh.shape[GAUSS_AXIS] * mesh.shape[TILE_AXIS]
    strip_rows, padded_h = strip_layout(height, tile_size, n_strips)
    rows_per_proc = padded_h // jax.process_count()
    return jax.process_index() * rows_per_proc, rows_per_proc


def globalize_target(local_rows: np.ndarray, padded_h: int,
                     mesh: Mesh) -> jax.Array:
    """Lift this host's (rows, W, 3) target strip into the global
    (padded_h, W, 3) array sharded PS((gauss, tiles)) -- each process
    contributes only its local rows; no host holds the full image."""
    sharding = NamedSharding(mesh, PS((GAUSS_AXIS, TILE_AXIS)))
    shape = (padded_h,) + tuple(local_rows.shape[1:])
    return jax.make_array_from_process_local_data(sharding, local_rows,
                                                  global_shape=shape)


def put_global(x, mesh: Mesh, spec: PS) -> jax.Array:
    """Place one host-replicated numpy/jax value as a GLOBAL array sharded
    by ``spec`` (every process passes the same full value; each contributes
    only the shards its devices own)."""
    x = np.asarray(x)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def put_global_tree(tree, mesh: Mesh, spec: PS):
    """``put_global`` over every array leaf of a pytree (model, optimizer
    state, camera). Rank-0 () leaves fall back to replicated placement."""
    def one(x):
        x = np.asarray(x)
        s = spec if x.ndim >= max(1, len(spec)) else PS()
        return put_global(x, mesh, s)

    return jax.tree.map(one, tree)


def is_coordinator() -> bool:
    return jax.process_index() == 0


def barrier(name: str = "gstpu") -> None:
    """Cross-process sync point (checkpoint write ordering etc.)."""
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)
