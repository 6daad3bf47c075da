"""Gaussian primitive set as a JAX pytree.

Re-designs the reference's ``Gaussians`` torch module (splat/gaussians.py:9-69)
as an immutable dataclass pytree of parameter arrays, built for ``jit``/
``grad``/``vmap`` and for fixed-capacity densification (an ``active`` mask
instead of dynamically growing tensors, which XLA cannot compile).

Parameterization (activations applied in the projection pass):
  * ``means``          (N, 3)   world-space centers
  * ``log_scales``     (N, 3)   per-axis scale, stored in log-space
                                (ref stores raw 1e-3 scales, gaussians.py:23;
                                log-storage is the standard 3DGS trick so Adam
                                steps are multiplicative)
  * ``quats``          (N, 4)   wxyz rotation, normalized on use
  * ``opacity_logits`` (N,)     sigmoid -> opacity (ref: gaussians.py:31-33)
  * ``sh``             (N, K, 3) spherical-harmonic color coefficients,
                                K = (sh_degree+1)^2. The reference has raw RGB
                                only (gaussians.py:20-22): that is sh_degree=0
                                with ``color_space="rgb"`` (no SH transform).
  * ``active``         (N,)    bool; False rows are dead pool capacity.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from intro_to_gaussian_splatting_tpu.utils.nputil import matmul32


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianModel:
    means: jax.Array
    log_scales: jax.Array
    quats: jax.Array
    opacity_logits: jax.Array
    sh: jax.Array
    active: jax.Array
    # "rgb": sh[:, 0] holds linear RGB directly (reference behavior).
    # "sh": standard 3DGS SH color model (view dependent).
    color_space: str = dataclasses.field(default="sh", metadata=dict(static=True))

    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    @property
    def num_active(self) -> jax.Array:
        return jnp.sum(self.active)

    @property
    def sh_degree(self) -> int:
        k = self.sh.shape[1]
        return int(round(k ** 0.5)) - 1

    def params(self) -> dict:
        """The trainable leaves (everything except the active mask)."""
        return dict(
            means=self.means, log_scales=self.log_scales, quats=self.quats,
            opacity_logits=self.opacity_logits, sh=self.sh,
        )

    def replace(self, **kw) -> "GaussianModel":
        return dataclasses.replace(self, **kw)


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def quats_to_rotmats(quats: jax.Array) -> jax.Array:
    """Batched wxyz quaternion -> (N, 3, 3) rotation; normalizes first.

    Same math as ref splat/utils.py:132-155, built functionally."""
    q = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)


def covariance_3d(log_scales: jax.Array, quats: jax.Array) -> jax.Array:
    """Sigma = (R S)(R S)^T, (N, 3, 3). ref: splat/gaussians.py:54-69."""
    R = quats_to_rotmats(quats)                       # (N, 3, 3)
    S = jnp.exp(log_scales)                           # (N, 3)
    RS = R * S[..., None, :]                          # R @ diag(S)
    return matmul32(RS, jnp.swapaxes(RS, -1, -2))


def covariance_3d_channels(log_scales: jax.Array, quats: jax.Array):
    """Sigma = (R S)(R S)^T as six (N,) channels (xx, xy, xz, yy, yz, zz).

    Same math as covariance_3d, but struct-of-arrays: batched 3x3 matmuls
    put 3-wide minor dims on 128-wide TPU lanes (measured ~0.6 ms per
    dot_general at 52k gaussians); expanded channel arithmetic fuses into
    one elementwise pass.
    """
    q = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    s2 = jnp.exp(2.0 * log_scales)                    # (N, 3) = diag(S)^2
    e0, e1, e2 = s2[..., 0], s2[..., 1], s2[..., 2]
    # Sigma_ab = sum_j R_aj R_bj s_j^2
    sxx = r00 * r00 * e0 + r01 * r01 * e1 + r02 * r02 * e2
    sxy = r00 * r10 * e0 + r01 * r11 * e1 + r02 * r12 * e2
    sxz = r00 * r20 * e0 + r01 * r21 * e1 + r02 * r22 * e2
    syy = r10 * r10 * e0 + r11 * r11 * e1 + r12 * r12 * e2
    syz = r10 * r20 * e0 + r11 * r21 * e1 + r12 * r22 * e2
    szz = r20 * r20 * e0 + r21 * r21 * e1 + r22 * r22 * e2
    return sxx, sxy, sxz, syy, syz, szz


def knn_mean_scale(points: jax.Array, k: int = 3, chunk: int = 1024) -> jax.Array:
    """Mean distance to the k nearest neighbors, per point.

    The paper-correct scale init the reference attempts but disables because
    its version materializes the full O(N^2) distance matrix
    (splat/gaussians.py:35-52). This computes the same quantity in O(N*chunk)
    memory by scanning query chunks; distances use the |a|^2+|b|^2-2ab matmul
    form so the inner loop runs on the MXU.
    """
    n = points.shape[0]
    pad = (-n) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    sq = jnp.sum(pts * pts, axis=-1)

    def body(qchunk):
        qpts, qsq, qidx = qchunk
        d2 = qsq[:, None] + sq[None, :] - 2.0 * matmul32(qpts, pts.T)
        # mask self-distance and padding columns
        col = jnp.arange(pts.shape[0])[None, :]
        d2 = jnp.where(col == qidx[:, None], jnp.inf, d2)
        d2 = jnp.where(col >= n, jnp.inf, d2)
        neg_top, _ = jax.lax.top_k(-d2, k)
        return jnp.mean(jnp.sqrt(jnp.maximum(-neg_top, 0.0)), axis=-1)

    idx = jnp.arange(pts.shape[0])
    chunks = (
        pts.reshape(-1, chunk, 3), sq.reshape(-1, chunk), idx.reshape(-1, chunk)
    )
    out = jax.lax.map(body, chunks).reshape(-1)
    return jnp.maximum(out[:n], 1e-5)


def init_from_points(
    points: np.ndarray,
    colors: np.ndarray,
    sh_degree: int = 0,
    color_space: str = "rgb",
    capacity: Optional[int] = None,
    opacity: float = 0.9999,
    scale_init: Optional[float] = 1e-3,
    dtype=jnp.float32,
) -> GaussianModel:
    """Build a GaussianModel from a COLMAP point cloud.

    Defaults reproduce the reference init exactly (splat/gaussians.py:19-33):
    colors/256, constant scale 1e-3, identity quats, opacity logit
    inverse_sigmoid(0.9999). Pass ``scale_init=None`` for the paper-correct
    3-NN mean-distance scale init, and ``sh_degree=3, color_space="sh"`` for
    the full 3DGS color model.
    """
    n = points.shape[0]
    cap = capacity or n
    assert cap >= n
    k = (sh_degree + 1) ** 2

    means = np.zeros((cap, 3), dtype=np.float32)
    means[:n] = points
    # spread dead slots far away with zero opacity so they never rasterize
    sh = np.zeros((cap, k, 3), dtype=np.float32)
    base_rgb = np.asarray(colors, dtype=np.float32) / 256.0  # ref: gaussians.py:21
    if color_space == "rgb":
        sh[:n, 0] = base_rgb
    else:
        from intro_to_gaussian_splatting_tpu.models.sh import rgb_to_sh
        sh[:n, 0] = rgb_to_sh(base_rgb)

    log_scales = np.full((cap, 3), np.log(1e-3), dtype=np.float32)
    if scale_init is not None:
        log_scales[:n] = np.log(scale_init)
    else:
        # Pin the KNN to the host CPU backend: np.asarray of an
        # accelerator-resident result is a device->host transfer, which some
        # remote-TPU transports cannot service, and an O(N^2/chunk) KNN is
        # init-time work that does not belong on the accelerator anyway.
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            d = np.asarray(
                knn_mean_scale(jnp.asarray(points, dtype=jnp.float32)))
        log_scales[:n] = np.log(np.maximum(d, 1e-7))[:, None]

    quats = np.zeros((cap, 4), dtype=np.float32)
    quats[:, 0] = 1.0

    opacity_logits = np.full(
        (cap,), float(np.log(opacity / (1 - opacity))), dtype=np.float32
    )
    opacity_logits[n:] = -20.0

    active = np.zeros((cap,), dtype=bool)
    active[:n] = True

    return GaussianModel(
        means=jnp.asarray(means, dtype=dtype),
        log_scales=jnp.asarray(log_scales, dtype=dtype),
        quats=jnp.asarray(quats, dtype=dtype),
        opacity_logits=jnp.asarray(opacity_logits, dtype=dtype),
        sh=jnp.asarray(sh, dtype=dtype),
        active=jnp.asarray(active),
        color_space=color_space,
    )
