"""Device-mesh construction helpers.

The reference is strictly single-process/single-GPU (SURVEY.md section 2.3:
no distributed code of any kind); here scale-out is expressed through
``jax.sharding.Mesh`` + ``shard_map`` with XLA collectives over ICI/DCN.

Axes:
  * "gauss": gaussian primitives sharded across devices (the DP-analogue
    over primitives; projection parallelizes, records are all-gathered).
  * "tiles": image tile rows sharded across devices (the SP/CP-analogue;
    rasterization parallelizes over pixels).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

GAUSS_AXIS = "gauss"
TILE_AXIS = "tiles"


def make_mesh(n_gauss_shards: Optional[int] = None,
              n_tile_shards: Optional[int] = None,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_gauss_shards is None and n_tile_shards is None:
        # favor tile sharding (more parallel work there), keep gauss axis
        # for memory scaling
        n_tile_shards = _largest_pow2_leq(int(np.sqrt(n)))
        n_gauss_shards = n // n_tile_shards
    elif n_gauss_shards is None:
        n_gauss_shards = n // n_tile_shards
    elif n_tile_shards is None:
        n_tile_shards = n // n_gauss_shards
    assert n_gauss_shards * n_tile_shards == n, \
        f"{n_gauss_shards}x{n_tile_shards} != {n} devices"
    dev_array = np.asarray(devices).reshape(n_gauss_shards, n_tile_shards)
    return Mesh(dev_array, (GAUSS_AXIS, TILE_AXIS))


def _largest_pow2_leq(x: int) -> int:
    p = 1
    while p * 2 <= x:
        p *= 2
    return p


def mesh_shape(mesh: Mesh) -> Tuple[int, int]:
    return mesh.shape[GAUSS_AXIS], mesh.shape[TILE_AXIS]
