"""Device->host value fetch that survives tunneled-TPU transports.

On some remote-TPU transports (axon), a DIRECT device->host transfer --
``float(x)``, ``np.asarray(x)``, ``jax.device_get`` -- blocks indefinitely,
and host callbacks (``io_callback`` / ``debug.print``) are unimplemented.
What DOES work is handing the device array to a jit compiled for the host
CPU backend: the cross-backend transfer path services it (measured: ~2 s
per small fetch once warm; a 193 MB image in ~16 s). The CPU jit must do
real work -- a pure identity can alias the input buffer and fall back to
the blocking path -- so every leaf gets a no-op arithmetic bump.

The reference has no analogue (single-process CUDA, `.item()` everywhere,
e.g. splat/utils.py:365); this exists so parity tests and benchmarks can
assert on-device results on hardware where naive fetches would hang.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _bump(a: jax.Array) -> jax.Array:
    """Force a real CPU computation without changing the value."""
    if a.dtype == jnp.bool_:
        return a ^ False
    return a + jnp.zeros((), a.dtype)


@functools.lru_cache(maxsize=None)
def _fetch_jit():
    cpu = jax.local_devices(backend="cpu")[0]
    return jax.jit(lambda t: jax.tree.map(_bump, t), device=cpu)


def host_fetch(tree):
    """Fetch a pytree of device arrays to host numpy, tunnel-safely.

    NOTE: the CPU-backend executable is compiled per pytree STRUCTURE, and
    on axon that compile is itself a remote round trip (tens of seconds,
    disk-cached afterwards). Latency-sensitive callers should fetch ONE
    f32 scalar shape everywhere -- see host_fetch_scalar."""
    out = _fetch_jit()(tree)
    return jax.tree.map(np.asarray, out)


def host_fetch_scalar(x) -> float:
    """Fetch one value as a float32 scalar -- always the SAME executable,
    so after the first (warmup) call every fetch reuses it."""
    out = _fetch_jit()(jnp.asarray(x, jnp.float32).reshape(()))
    return float(np.asarray(out))


def host_fetch_scalars(d: dict) -> dict:
    """Fetch a dict of device scalars as floats in ONE fused transfer.

    The values are stacked into a single (K,) f32 vector on device, so the
    whole dict costs one cross-backend fetch (and one cached CPU executable
    per distinct K) instead of K round trips. This is the logging-path
    helper: Trainer.run fetches its metrics dict through it every
    ``log_every`` steps (a direct ``float(v)`` blocks forever on tunneled
    transports, see module docstring).
    """
    keys = list(d)
    vec = jnp.stack([jnp.asarray(d[k], jnp.float32).reshape(())
                     for k in keys])
    out = np.asarray(_fetch_jit()(vec))
    return {k: float(out[i]) for i, k in enumerate(keys)}


def warm_fetch() -> float:
    """Compile + exercise the scalar fetch path once (slow on cold axon
    remote-compile queues; disk-cached for later processes)."""
    return host_fetch_scalar(jnp.zeros((), jnp.float32))
