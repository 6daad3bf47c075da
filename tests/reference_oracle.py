"""Import the reference implementation (read-only at /root/reference) as a
behavioral oracle for parity tests.

We never copy reference code into this repo; instead, tests call the actual
reference functions (pure-torch, CPU) and assert our JAX implementation
matches. ``plyfile`` is not installed in this image, so a minimal stub is
injected before import (only ``storePly``/``fetchPly`` touch it, which the
oracle tests never call).
"""

import sys
import types

REFERENCE_PATH = "/root/reference"


def _stub_plyfile():
    if "plyfile" in sys.modules:
        return
    mod = types.ModuleType("plyfile")

    class _Unavailable:
        def __init__(self, *a, **k):
            raise RuntimeError("plyfile stubbed out in tests")

        @staticmethod
        def read(*a, **k):
            raise RuntimeError("plyfile stubbed out in tests")

        @staticmethod
        def describe(*a, **k):
            raise RuntimeError("plyfile stubbed out in tests")

    mod.PlyData = _Unavailable
    mod.PlyElement = _Unavailable
    sys.modules["plyfile"] = mod


def load_reference():
    """Returns the reference ``splat`` package (or raises ImportError)."""
    _stub_plyfile()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import splat.utils  # noqa: F401
    import splat.gaussians  # noqa: F401
    import splat.gaussian_scene  # noqa: F401
    import splat.image  # noqa: F401
    import splat.read_colmap  # noqa: F401
    import splat
    return splat
