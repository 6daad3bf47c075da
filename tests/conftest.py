"""Test configuration: force an 8-device virtual CPU platform so sharding
tests exercise a real Mesh without TPU hardware, per the project brief.

Set GSTPU_TPU_TESTS=1 to keep the real TPU backend instead (used by
tests/test_tpu.py -- the compiled-Mosaic vs interpret parity gate, which
only runs on hardware): `GSTPU_TPU_TESTS=1 pytest tests/test_tpu.py`.
In the default CPU session those tests self-skip.
"""

import os

_TPU_SESSION = os.environ.get("GSTPU_TPU_TESTS") == "1"

if not _TPU_SESSION:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _TPU_SESSION:
    # The axon sitecustomize force-registers the TPU backend and overrides
    # jax_platforms to "axon,cpu"; tests must run on the virtual 8-device CPU
    # platform, so override it back before any backend is initialized.
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
