"""Numerics helpers.

TPU matmuls default to single-pass bf16 MXU input truncation
(``Precision.DEFAULT``); the splatting geometry and the log-space
transmittance prefix sums need full f32, so every matmul in the hot path
goes through these helpers with ``Precision.HIGHEST`` explicitly.
"""

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST


def matmul32(a, b):
    """f32-accurate matmul (multi-pass bf16 on the MXU)."""
    return jnp.matmul(a, b, precision=HIGHEST)


def dot32(a, b):
    return jnp.dot(a, b, precision=HIGHEST, preferred_element_type=jnp.float32)
