"""Native C++ component tests: golden-oracle rasterizer + COLMAP parser."""

import numpy as np
import pytest

from intro_to_gaussian_splatting_tpu.config import CompatConfig, RasterizerConfig
from intro_to_gaussian_splatting_tpu.io import colmap as C
from intro_to_gaussian_splatting_tpu.io.synthetic import make_colmap_scene
from intro_to_gaussian_splatting_tpu.ops.compositing import (
    _sorted_records, render_dense,
)
from intro_to_gaussian_splatting_tpu.ops.projection import project_gaussians
from intro_to_gaussian_splatting_tpu.utils import native
from tests.scenes import small_scene

pytestmark = pytest.mark.skipif(
    not (native.oracle_available() and native.colmap_available()),
    reason="native libs not built (no compiler?)")


@pytest.mark.parametrize("cfg", [
    RasterizerConfig(),
    RasterizerConfig(compat=CompatConfig.REFERENCE_CUDA, t_threshold=1e-3),
    RasterizerConfig(alpha_min=1.0 / 255.0),
])
def test_oracle_matches_dense_renderer(cfg):
    """The scalar C++ loop and the vectorized MXU formulation agree."""
    raw, cam, model = small_scene(n=120, width=48, height=32, seed=31)
    proj = project_gaussians(model, cam, cfg)
    rec, order = _sorted_records(proj)
    valid = np.asarray(proj.valid)[np.asarray(order)]

    img_oracle = native.oracle_render(
        np.asarray(rec), valid, cam.width, cam.height, cfg)
    img_dense = np.asarray(render_dense(model, cam, cfg))
    np.testing.assert_allclose(img_oracle, img_dense, rtol=1e-4, atol=1e-5)


def test_oracle_skip_last_tile():
    cfg = RasterizerConfig(compat=CompatConfig.REFERENCE_CPU, t_threshold=1e-6)
    raw, cam, model = small_scene(n=60, width=48, height=32, seed=7)
    proj = project_gaussians(model, cam, cfg)
    rec, order = _sorted_records(proj)
    valid = np.asarray(proj.valid)[np.asarray(order)]
    img = native.oracle_render(np.asarray(rec), valid, 48, 32, cfg)
    assert np.all(img[:, 32:] == 0.0)
    img_dense = np.asarray(render_dense(model, cam, cfg, exact_break=True))
    np.testing.assert_allclose(img, img_dense, rtol=1e-4, atol=1e-5)


def test_native_colmap_matches_python(tmp_path):
    sparse = make_colmap_scene(str(tmp_path), num_points=300, num_cameras=3)

    pts_native = C.ColmapPoints(**native.read_points3d_native(
        str(tmp_path / "sparse" / "0" / "points3D.bin")))
    # force the pure-python path for comparison
    import intro_to_gaussian_splatting_tpu.utils.native as nat
    saved = nat._colmap_lib
    nat._colmap_lib = False
    try:
        pts_py = C.read_points3D_binary(
            str(tmp_path / "sparse" / "0" / "points3D.bin"))
        im_py = C.read_images_binary(
            str(tmp_path / "sparse" / "0" / "images.bin"))
    finally:
        nat._colmap_lib = saved

    np.testing.assert_array_equal(pts_native.ids, pts_py.ids)
    np.testing.assert_array_equal(pts_native.xyz, pts_py.xyz)
    np.testing.assert_array_equal(pts_native.rgb, pts_py.rgb)
    np.testing.assert_array_equal(pts_native.track_image_ids,
                                  pts_py.track_image_ids)

    im_native = C.read_images_binary(
        str(tmp_path / "sparse" / "0" / "images.bin"))
    assert set(im_native) == set(im_py)
    for k in im_py:
        np.testing.assert_array_equal(im_native[k].qvec, im_py[k].qvec)
        np.testing.assert_array_equal(im_native[k].xys, im_py[k].xys)
        np.testing.assert_array_equal(im_native[k].point3D_ids,
                                      im_py[k].point3D_ids)
        assert im_native[k].name == im_py[k].name
