import numpy as np
import pytest

from intro_to_gaussian_splatting_tpu.config import CompatConfig, RasterizerConfig
from intro_to_gaussian_splatting_tpu.ops.projection import project_gaussians
from tests.reference_oracle import load_reference
from tests.scenes import reference_scene, small_scene


@pytest.fixture(scope="module")
def splat():
    return load_reference()


COMPAT_CPU = RasterizerConfig(compat=CompatConfig.REFERENCE_CPU, t_threshold=1e-6)


def test_projection_matches_reference_preprocess(splat):
    raw, cam, model = small_scene(n=80)
    scene = reference_scene(splat, raw)
    import torch
    with torch.no_grad():
        ref = scene.preprocess(0)

    proj = project_gaussians(model, cam, COMPAT_CPU)
    valid = np.asarray(proj.valid)
    n_valid = valid.sum()
    assert n_valid == ref.points.shape[0], "frustum cull count differs"

    # reference outputs are depth-sorted and compacted; ours are slot-aligned
    order = np.argsort(np.asarray(proj.depth)[valid])
    mean2d = np.asarray(proj.mean2d)[valid][order]
    depth = np.asarray(proj.depth)[valid][order]
    conic = np.asarray(proj.conic)[valid][order]
    radius = np.asarray(proj.radius)[valid][order]
    opacity = np.asarray(proj.opacity)[valid][order]
    color = np.asarray(proj.color)[valid][order]

    np.testing.assert_allclose(depth, ref.depths.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(mean2d, ref.points_xy.numpy(), rtol=1e-4, atol=2e-3)
    ref_inv = ref.inverse_covariance_2d.numpy()
    np.testing.assert_allclose(conic[:, 0], ref_inv[:, 0, 0], rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(conic[:, 1], ref_inv[:, 0, 1], rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(conic[:, 2], ref_inv[:, 1, 1], rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(radius, ref.radius.numpy(), atol=1.0)
    assert (np.abs(radius - ref.radius.numpy()) > 0).mean() < 0.05, \
        "ceil() radius should match almost everywhere"
    # our compat projection folds in the double sigmoid that the reference
    # applies later in render_pixel (gaussian_scene.py:164)
    ref_op = torch.sigmoid(ref.sigmoid_opacity).numpy().ravel()
    np.testing.assert_allclose(opacity, ref_op, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(color, ref.colors.numpy(), rtol=1e-5, atol=1e-6)


def test_frustum_cull_semantics(splat):
    """Points behind the camera or closer than 0.2 are invalid."""
    raw, cam, model = small_scene(n=50, seed=3)
    proj = project_gaussians(model, cam, COMPAT_CPU)
    valid = np.asarray(proj.valid)
    depth = np.asarray(proj.depth)
    assert np.all(depth[valid] >= 0.2)
    # the cull keeps exactly the z >= 0.2 subset of active gaussians
    assert np.array_equal(valid, (depth >= 0.2) & (np.asarray(proj.radius) > 0))


def test_projection_is_differentiable():
    import jax
    import jax.numpy as jnp

    raw, cam, model = small_scene(n=30)

    def loss(means):
        proj = project_gaussians(model.replace(means=means), cam, COMPAT_CPU)
        return jnp.sum(jnp.where(proj.valid, proj.mean2d[:, 0], 0.0))

    g = jax.grad(loss)(model.means)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
