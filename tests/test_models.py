import numpy as np
import jax.numpy as jnp
import pytest

from intro_to_gaussian_splatting_tpu.models.camera import (
    focal2fov,
    make_camera,
    perspective_matrix,
    quat_to_rotmat,
    stack_cameras,
    index_camera,
)
from intro_to_gaussian_splatting_tpu.models.gaussians import (
    covariance_3d,
    init_from_points,
    knn_mean_scale,
    quats_to_rotmats,
)
from intro_to_gaussian_splatting_tpu.models.sh import C0, eval_sh, rgb_to_sh, sh_to_rgb
from tests.reference_oracle import load_reference


@pytest.fixture(scope="module")
def splat():
    return load_reference()


def test_quat_to_rotmat_matches_reference(splat, rng):
    import torch
    q = rng.normal(size=(8, 4))
    ours = np.asarray(quats_to_rotmats(jnp.asarray(q, dtype=jnp.float32)))
    ref = splat.utils.build_rotation(torch.tensor(q, dtype=torch.float32)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)
    # single-quaternion host version
    one = quat_to_rotmat(q[0])
    np.testing.assert_allclose(one, ref[0], atol=1e-6)


def test_rotmats_are_orthonormal(rng):
    q = rng.normal(size=(16, 4))
    R = np.asarray(quats_to_rotmats(jnp.asarray(q, dtype=jnp.float32)))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_covariance_3d_matches_reference(splat, rng):
    import torch

    n = 12
    scales = rng.uniform(0.01, 0.5, size=(n, 3))
    quats = rng.normal(size=(n, 4))

    g = splat.gaussians.Gaussians.__new__(splat.gaussians.Gaussians)
    g.device = torch.device("cpu")
    g.points = torch.zeros((n, 3))
    g.scales = torch.tensor(scales, dtype=torch.float32)
    g.quaternions = torch.tensor(quats, dtype=torch.float32)
    ref = g.get_3d_covariance_matrix().detach().numpy()

    ours = np.asarray(covariance_3d(
        jnp.log(jnp.asarray(scales, dtype=jnp.float32)),
        jnp.asarray(quats, dtype=jnp.float32)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_perspective_matrix_matches_reference(splat):
    import torch
    fovx, fovy = 1.1, 0.8
    ref = splat.utils.getProjectionMatrix(
        znear=torch.tensor([0.001]), zfar=torch.tensor([100.0]),
        fovX=torch.tensor([fovx]), fovY=torch.tensor([fovy])).numpy()
    ours = perspective_matrix(0.001, 100.0, fovx, fovy)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_camera_matches_reference_image(splat, rng):
    """Camera pytree fields vs the reference GaussianImage precompute."""
    import torch
    from splat.read_colmap import Camera as RefCamera, Image as RefImage

    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    t = rng.normal(size=3)
    fx, fy, w, h = 120.0, 110.0, 160, 120
    ref_cam = RefCamera(id=1, model="PINHOLE", width=w, height=h,
                        params=np.array([fx, fy, w / 2, h / 2]))
    ref_im = RefImage(id=1, qvec=q, tvec=t, camera_id=1, name="x",
                      xys=np.zeros((0, 2)), point3D_ids=np.zeros(0))
    gi = splat.image.GaussianImage(camera=ref_cam, image=ref_im)

    cam = make_camera(fx=fx, fy=fy, width=w, height=h, qvec=q, tvec=t)
    np.testing.assert_allclose(
        np.asarray(cam.world2view), gi.world2view.numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(cam.full_proj), gi.full_proj_transform.numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(cam.cam_center), gi.camera_center.numpy(), atol=1e-4)
    np.testing.assert_allclose(float(cam.tan_fovx), float(gi.tan_fovX), rtol=1e-6)
    np.testing.assert_allclose(float(cam.tan_fovy), float(gi.tan_fovY), rtol=1e-6)


def test_stack_and_index_cameras(rng):
    cams = [
        make_camera(100.0, 100.0, 64, 48, rng.normal(size=4), rng.normal(size=3))
        for _ in range(3)
    ]
    batch = stack_cameras(cams)
    assert batch.world2view.shape == (3, 4, 4)
    assert batch.width == 64
    one = index_camera(batch, 1)
    np.testing.assert_allclose(
        np.asarray(one.full_proj), np.asarray(cams[1].full_proj))


def test_knn_mean_scale_matches_bruteforce(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    ours = np.asarray(knn_mean_scale(jnp.asarray(pts), k=3, chunk=32))
    d = np.linalg.norm(pts[None] - pts[:, None], axis=-1)
    np.fill_diagonal(d, np.inf)
    ref = np.sort(d, axis=1)[:, :3].mean(axis=1)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_init_from_points_reference_defaults(rng):
    pts = rng.normal(size=(10, 3))
    cols = rng.integers(0, 256, size=(10, 3))
    m = init_from_points(pts, cols, capacity=16)
    assert m.capacity == 16
    assert int(m.num_active) == 10
    np.testing.assert_allclose(np.asarray(m.sh[:10, 0]), cols / 256.0, atol=1e-6)
    np.testing.assert_allclose(np.exp(np.asarray(m.log_scales[:10])), 1e-3, rtol=1e-5)
    # opacity logit == inverse_sigmoid(0.9999), ref gaussians.py:31-33
    np.testing.assert_allclose(
        1 / (1 + np.exp(-np.asarray(m.opacity_logits[:10]))), 0.9999, atol=1e-6)
    assert not bool(m.active[10:].any())


def test_sh_roundtrip_and_degree0(rng):
    rgb = rng.uniform(0.1, 0.9, size=(5, 3)).astype(np.float32)
    sh0 = rgb_to_sh(rgb)
    np.testing.assert_allclose(sh_to_rgb(sh0), rgb, rtol=1e-6)
    sh = jnp.zeros((5, 16, 3)).at[:, 0].set(jnp.asarray(sh0))
    dirs = jnp.asarray(rng.normal(size=(5, 3)), dtype=jnp.float32)
    dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
    # degree-0 eval is view-independent and exactly recovers rgb
    out = eval_sh(sh, dirs, 0)
    np.testing.assert_allclose(np.asarray(out), rgb, rtol=1e-5, atol=1e-6)
    # higher degrees with zero coeffs change nothing
    out3 = eval_sh(sh, dirs, 3)
    np.testing.assert_allclose(np.asarray(out3), rgb, rtol=1e-5, atol=1e-6)


def test_sh_degree1_view_dependence(rng):
    sh = jnp.zeros((1, 4, 3)).at[:, 1, :].set(1.0)
    d1 = jnp.asarray([[0.0, 1.0, 0.0]])
    d2 = jnp.asarray([[0.0, -1.0, 0.0]])
    o1 = np.asarray(eval_sh(sh, d1, 1))
    o2 = np.asarray(eval_sh(sh, d2, 1))
    assert not np.allclose(o1, o2)


def test_world2view_recentered_matches_reference(splat, rng):
    """world2view_recentered vs the reference's getWorld2View2
    (splat/utils.py:175-186): same recompose-invert-shift-scale-invert
    math, including v2's R-transpose quirk."""
    import torch

    from intro_to_gaussian_splatting_tpu.models.camera import (
        quat_to_rotmat, world2view_recentered,
    )

    q = rng.normal(size=4)
    R = quat_to_rotmat(q)
    t = rng.normal(size=3)
    translate = rng.normal(size=3)
    scale = 1.7
    got = world2view_recentered(R, t, translate=translate, scale=scale)
    want = splat.utils.getWorld2View2(
        torch.tensor(R, dtype=torch.float32),
        torch.tensor(t, dtype=torch.float32),
        translate=torch.tensor(translate, dtype=torch.float32),
        scale=scale).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # identity transform reduces to the plain [R^T | t] recomposition
    plain = world2view_recentered(R, t)
    rt = np.zeros((4, 4))
    rt[:3, :3] = R.T
    rt[:3, 3] = t
    rt[3, 3] = 1.0
    np.testing.assert_allclose(plain, rt, atol=1e-10)
