"""Checkpoint / resume and PLY interop.

The reference's only persistence is one PLY write at init
(splat/gaussians.py:17-18); here: orbax checkpoints of the full training
state (gaussian pytree + optimizer moments + step), plus import/export of
the standard 3DGS PLY layout (f_dc_*/f_rest_*/opacity/scale_*/rot_*) so
scenes interoperate with public 3DGS viewers.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from intro_to_gaussian_splatting_tpu.models.gaussians import GaussianModel


def save_checkpoint(path: str, model: GaussianModel, opt_state: Any,
                    step: int) -> None:
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = dict(
        model=model.params(), active=model.active, step=np.asarray(step, dtype=np.int64),
        opt_state=opt_state,
    )
    ckptr.save(os.path.join(path, f"step_{step}"), payload, force=True)
    ckptr.wait_until_finished()


def list_checkpoint_steps(path: str):
    """Step numbers with a saved checkpoint under ``path``, ascending.

    Only exact ``step_<N>`` directories count: an interrupted orbax save
    leaves ``step_N.orbax-checkpoint-tmp-<ts>`` siblings behind, and resume
    (the crash-recovery path) must skip those instead of crashing on
    ``int()``.
    """
    path = os.path.abspath(path)
    if not os.path.isdir(path):
        return []
    steps = []
    for d in os.listdir(path):
        m = re.fullmatch(r"step_(\d+)", d)
        if m:
            steps.append(int(m.group(1)))
    return sorted(steps)


def prune_checkpoints(path: str, keep: int) -> None:
    """Delete all but the newest ``keep`` step_* checkpoints (call from
    process 0 only in multi-host runs)."""
    import shutil
    steps = list_checkpoint_steps(path)
    for s in steps[:-keep] if keep > 0 else []:
        shutil.rmtree(os.path.join(os.path.abspath(path), f"step_{s}"),
                      ignore_errors=True)


def load_checkpoint(path: str, model_template: GaussianModel,
                    opt_state_template: Any,
                    step: Optional[int] = None) -> Tuple[GaussianModel, Any, int]:
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    if step is None:
        steps = list_checkpoint_steps(path)
        if not steps:
            raise FileNotFoundError(
                f"no step_<N> checkpoints under {path}")
        step = max(steps)
    ckptr = ocp.StandardCheckpointer()
    template = dict(
        model=model_template.params(), active=model_template.active,
        step=np.asarray(0, dtype=np.int64), opt_state=opt_state_template,
    )
    restored = ckptr.restore(os.path.join(path, f"step_{step}"), template)
    model = model_template.replace(active=restored["active"],
                                   **restored["model"])
    return model, restored["opt_state"], int(restored["step"])


def export_ply(path: str, model: GaussianModel) -> None:
    """Write active gaussians in the standard 3DGS checkpoint PLY layout."""
    from intro_to_gaussian_splatting_tpu.io.ply import write_ply

    active = np.asarray(model.active)
    means = np.asarray(model.means)[active]
    sh = np.asarray(model.sh)[active]           # (n, K, 3)
    n, k, _ = sh.shape
    extra = {
        "f_dc": sh[:, 0, :],
        "opacity": np.asarray(model.opacity_logits)[active],
        "scale": np.asarray(model.log_scales)[active],
        "rot": np.asarray(model.quats)[active],
    }
    if k > 1:
        # 3DGS layout: f_rest is (K-1, 3) transposed to channel-major
        extra["f_rest"] = sh[:, 1:, :].transpose(0, 2, 1).reshape(n, -1)
    write_ply(path, means, extra=extra)


def import_ply(path: str, color_space: str = "sh") -> GaussianModel:
    """Read a 3DGS-layout PLY back into a GaussianModel."""
    from intro_to_gaussian_splatting_tpu.io.ply import read_ply

    data = read_ply(path)
    n = len(data["x"])
    means = np.stack([data["x"], data["y"], data["z"]], axis=1)
    sh0 = np.stack([data[f"f_dc_{i}"] for i in range(3)], axis=1)
    rest_keys = sorted(
        (k for k in data if k.startswith("f_rest_")),
        key=lambda s: int(s.split("_")[-1]))
    if rest_keys:
        rest = np.stack([data[k] for k in rest_keys], axis=1)
        km1 = rest.shape[1] // 3
        rest = rest.reshape(n, 3, km1).transpose(0, 2, 1)
        sh = np.concatenate([sh0[:, None, :], rest], axis=1)
    else:
        sh = sh0[:, None, :]
    return GaussianModel(
        means=jnp.asarray(means, jnp.float32),
        log_scales=jnp.asarray(
            np.stack([data[f"scale_{i}"] for i in range(3)], 1), jnp.float32),
        quats=jnp.asarray(
            np.stack([data[f"rot_{i}"] for i in range(4)], 1), jnp.float32),
        opacity_logits=jnp.asarray(data["opacity"], jnp.float32),
        sh=jnp.asarray(sh, jnp.float32),
        active=jnp.ones((n,), bool),
        color_space=color_space,
    )
