"""Two-process `jax.distributed` smoke test (BASELINE config 5 surface).

Spawns two REAL OS processes, each a separate JAX runtime with 2 virtual
CPU devices, joined via `jax.distributed.initialize` (Gloo collectives).
Both run `sharded_train_step` on the global 2x2 mesh with per-process
target rows and must print identical psum-replicated losses that
decrease. See parallel/multihost_smoke.py for the worker.
"""

import os
import re
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_train_step():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-m",
             "intro_to_gaussian_splatting_tpu.parallel.multihost_smoke",
             str(pid), "2", f"localhost:{port}"],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pid {pid} failed:\n{out}"

    parsed = []
    for out in outs:
        m = re.search(r"SMOKE pid=\d+ losses=([\d.,-]+) psnr=([-\d.]+)", out)
        assert m, out
        parsed.append((tuple(float(x) for x in m.group(1).split(",")),
                       float(m.group(2))))
    (l0, p0), (l1, p1) = parsed
    # psum-replicated scalars: both processes must agree exactly
    assert l0 == l1 and p0 == p1, parsed
    # optimization is real: loss decreases over the 3 steps
    assert l0[-1] < l0[0], parsed
    assert all(v > 0 for v in l0)
