"""Camera model as a JAX pytree.

Re-designs the reference's per-image ``GaussianImage`` object zoo
(splat/image.py:18-70, one ``nn.Module`` per image holding ~10 tensors) as a
single dataclass pytree whose leaves can carry a leading batch dimension, so a
whole scene's cameras live in one stacked device array and a render step can
``vmap``/shard over them.

Conventions (identical to the reference so tests can compare, SURVEY.md §4):
  * row-vector convention: points transform as ``p_homog @ M``; matrices are
    stored pre-transposed (ref: splat/image.py:51-65).
  * ``world2view`` = [R | t] homogeneous, transposed (ref: utils.py:162-172).
  * ``projection`` = OpenGL-style perspective from fov, znear=0.001, zfar=100
    (ref: utils.py:189-225, image.py:46-47). The principal point is assumed
    centered, as in the reference.
  * ``full_proj = world2view @ projection`` (ref: image.py:61-65).
  * quaternions are wxyz (ref: utils.py:132-155).
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Z_NEAR = 0.001  # ref: splat/image.py:47
Z_FAR = 100.0   # ref: splat/image.py:46


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """One camera (or a stacked batch if leaves have a leading dim).

    ``width``/``height`` are static metadata so image shapes stay compile-time
    constants under ``jit``.
    """

    world2view: jax.Array      # (4, 4) row-vector world->camera
    full_proj: jax.Array       # (4, 4) row-vector world->clip
    fx: jax.Array              # () focal length, pixels
    fy: jax.Array
    tan_fovx: jax.Array        # () tan(fovX / 2)
    tan_fovy: jax.Array
    cam_center: jax.Array      # (3,) camera position in world coords
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))

    @property
    def batch_shape(self) -> Tuple[int, ...]:
        return self.world2view.shape[:-2]


def quat_to_rotmat(q: np.ndarray) -> np.ndarray:
    """wxyz quaternion (4,) -> rotation matrix (3,3); normalizes first.

    Same formula as ref splat/utils.py:132-155 (build_rotation)."""
    q = np.asarray(q, dtype=np.float64)
    q = q / np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def focal2fov(focal: float, pixels: float) -> float:
    """ref: splat/utils.py:158-159."""
    return 2.0 * math.atan(pixels / (2.0 * focal))


def perspective_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """OpenGL-style perspective projection (column-vector form).

    ref: splat/utils.py:189-225 (getProjectionMatrix)."""
    tan_half_fovy = math.tan(fovy / 2)
    tan_half_fovx = math.tan(fovx / 2)
    top = tan_half_fovy * znear
    right = tan_half_fovx * znear
    P = np.zeros((4, 4))
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def make_camera(
    fx: float, fy: float, width: int, height: int,
    qvec: np.ndarray, tvec: np.ndarray,
    znear: float = Z_NEAR, zfar: float = Z_FAR,
    dtype=jnp.float32,
) -> Camera:
    """Build a Camera from COLMAP-style pose (qvec wxyz, tvec world->cam)."""
    R = quat_to_rotmat(qvec)
    w2v = np.zeros((4, 4))
    w2v[:3, :3] = R
    w2v[:3, 3] = np.asarray(tvec, dtype=np.float64)
    w2v[3, 3] = 1.0
    w2v = w2v.T  # row-vector convention (ref: image.py:51-53)
    fovx = focal2fov(fx, width)
    fovy = focal2fov(fy, height)
    proj = perspective_matrix(znear, zfar, fovx, fovy).T
    full_proj = w2v @ proj
    cam_center = np.linalg.inv(w2v)[3, :3]
    return Camera(
        world2view=jnp.asarray(w2v, dtype=dtype),
        full_proj=jnp.asarray(full_proj, dtype=dtype),
        fx=jnp.asarray(fx, dtype=dtype),
        fy=jnp.asarray(fy, dtype=dtype),
        tan_fovx=jnp.asarray(math.tan(fovx / 2), dtype=dtype),
        tan_fovy=jnp.asarray(math.tan(fovy / 2), dtype=dtype),
        cam_center=jnp.asarray(cam_center, dtype=dtype),
        width=int(width),
        height=int(height),
    )


def world2view_recentered(
    R: np.ndarray, t: np.ndarray,
    translate: np.ndarray = (0.0, 0.0, 0.0), scale: float = 1.0,
) -> np.ndarray:
    """World->view with a recentered/rescaled camera position.

    Analogue of the reference's ``getWorld2View2``
    (splat/utils.py:175-186): recompose [Rᵀ | t], invert to cam2world,
    shift+scale the camera center, invert back. Used by 3DGS-family
    code to normalize scene translation/scale; unused by the reference's
    own render path but part of its API surface. Note the reference's v2
    transposes R where ``getWorld2View`` (utils.py:162-172) does not --
    reproduced here since that is the documented v2 behavior.

    Returns the plain (column-vector) 4x4; pass its transpose where the
    row-vector convention is needed (as ``make_camera`` does internally).
    """
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = np.asarray(R, dtype=np.float64).T
    Rt[:3, 3] = np.asarray(t, dtype=np.float64)
    Rt[3, 3] = 1.0
    c2w = np.linalg.inv(Rt)
    c2w[:3, 3] = (c2w[:3, 3] + np.asarray(translate, np.float64)) * scale
    return np.linalg.inv(c2w)


def camera_from_colmap(camera, image, downscale: int = 1) -> Camera:
    """Build from io.colmap records (ColmapCamera, ColmapImage)."""
    return make_camera(
        fx=camera.fx / downscale, fy=camera.fy / downscale,
        width=camera.width // downscale, height=camera.height // downscale,
        qvec=image.qvec, tvec=image.tvec,
    )


def stack_cameras(cams: List[Camera]) -> Camera:
    """Stack same-resolution cameras into one batched Camera pytree."""
    w, h = cams[0].width, cams[0].height
    assert all(c.width == w and c.height == h for c in cams), \
        "stack_cameras requires equal resolutions; group by size first"
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)


def index_camera(cams: Camera, i) -> Camera:
    """Select camera i out of a stacked Camera."""
    return jax.tree.map(lambda x: x[i], cams)
