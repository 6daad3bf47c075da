"""Point-projection sanity path (ops/points.py) vs the reference
``GaussianImage.project_point_to_camera_perspective_projection``
(splat/image.py:72-89), plus the profiling helpers."""

import numpy as np
import pytest

from intro_to_gaussian_splatting_tpu.ops.points import (
    project_points,
    render_points_image,
)
from tests.reference_oracle import load_reference
from tests.scenes import reference_scene, small_scene


@pytest.fixture(scope="module")
def splat():
    return load_reference()


def test_project_points_matches_reference(splat):
    raw, cam, model = small_scene(n=120, seed=11)
    scene = reference_scene(splat, raw)
    import torch

    with torch.no_grad():
        ref_xy, _ = scene.images[0].project_point_to_camera_perspective_projection(
            torch.tensor(raw["points"], dtype=torch.float32),
            torch.tensor(raw["colors"], dtype=torch.float32))
    xy, depth, valid = project_points(model.means, cam)
    xy = np.asarray(xy)
    valid = np.asarray(valid)

    # The reference culls (z >= 0.2) then returns pixel coords for survivors
    # (including off-screen ones); ours additionally marks off-screen points
    # invalid, so compare on the common in-frustum set.
    in_frustum = np.asarray(depth) >= 0.2
    assert in_frustum.sum() == ref_xy.shape[0]
    np.testing.assert_allclose(
        xy[in_frustum], ref_xy.numpy()[:, :2], rtol=1e-4, atol=2e-3)
    # every valid point is also in-frustum and on-screen
    assert np.all(in_frustum[valid])
    w, h = raw["width"], raw["height"]
    assert np.all((xy[valid, 0] >= 0) & (xy[valid, 0] < w))
    assert np.all((xy[valid, 1] >= 0) & (xy[valid, 1] < h))


def test_render_points_image_shapes_and_hits():
    raw, cam, model = small_scene(n=80, seed=5)
    colors = np.asarray(model.sh[:, 0, :])
    img = np.asarray(render_points_image(model.means, colors, cam,
                                         background=1.0, splat_radius=1))
    assert img.shape == (cam.height, cam.width, 3)
    # some pixels must differ from the background
    assert (np.abs(img - 1.0) > 1e-6).any()
    # nearest-point-wins: all written colors come from the input palette
    written = img[np.abs(img - 1.0).sum(-1) > 1e-6]
    d = np.abs(written[:, None, :] - colors[None, :, :]).sum(-1).min(1)
    assert d.max() < 1e-5


def test_keypoint_overlay_matches_stored_keypoints(tmp_path):
    """The reference's de-facto correctness oracle: projected 3D points
    land on COLMAP's stored 2D keypoints (splat/gaussian_scene.py:44-51,
    cpu_render.ipynb cells 3/5 scatter overlay). The synthetic scene
    writes TRUE projected keypoints, so the overlay is assertable in
    pixels, via both the device path (ops.points.project_points) and the
    report helper the CLI exposes (--compare-keypoints)."""
    from intro_to_gaussian_splatting_tpu.io import read_model
    from intro_to_gaussian_splatting_tpu.io.synthetic import make_colmap_scene
    from intro_to_gaussian_splatting_tpu.models.camera import (
        camera_from_colmap,
    )
    from intro_to_gaussian_splatting_tpu.ops.points import (
        keypoint_reprojection_report,
    )

    sparse = make_colmap_scene(str(tmp_path), num_points=300, num_cameras=3,
                               width=160, height=120, seed=3)
    cameras, images, points = read_model(sparse)

    for iid in sorted(images.keys()):
        im = images[iid]
        cam_rec = cameras[im.camera_id]

        # device path: project the full cloud, compare slots by point id
        cam = camera_from_colmap(cam_rec, im)
        xy, depth, valid = project_points(
            np.asarray(points.xyz, np.float32), cam)
        xy = np.asarray(xy)
        id_to_row = {int(p): i for i, p in enumerate(points.ids)}
        n_checked = 0
        for k, pid in enumerate(im.point3D_ids):
            row = id_to_row[int(pid)]
            assert valid[row], "stored keypoint for a point we cull"
            np.testing.assert_allclose(xy[row], im.xys[k], atol=0.05,
                                       err_msg=f"image {iid} keypoint {k}")
            n_checked += 1
        assert n_checked > 20

        # report helper (host-only numpy path, what the CLI prints)
        r = keypoint_reprojection_report(points, cam_rec, im)
        assert r["n_matched"] == r["n_keypoints"] == n_checked
        assert r["max_px"] < 0.05
        # downscale must stay scale-consistent: the report projects at
        # full resolution and rescales, so no (d-1)/d px systematic
        # offset appears (ndc2Pix scales by (dim-1)/2, not dim/2)
        r2 = keypoint_reprojection_report(points, cam_rec, im, downscale=2)
        assert r2["n_matched"] == n_checked
        assert r2["max_px"] < 0.05, \
            f"downscaled report carries a systematic offset: {r2}"

    # noisy keypoints (a real bundle adjustment) show up in the report
    sparse_n = make_colmap_scene(str(tmp_path / "noisy"), num_points=200,
                                 num_cameras=2, width=160, height=120,
                                 seed=4, keypoint_noise_px=1.0)
    _, images_n, points_n = read_model(sparse_n)
    cams_n, _, _ = read_model(sparse_n)
    im = images_n[1]
    r = keypoint_reprojection_report(points_n, cams_n[im.camera_id], im)
    assert 0.2 < r["mean_px"] < 5.0


def test_benchmark_helper():
    from intro_to_gaussian_splatting_tpu.utils.profiling import (
        benchmark, rasterizer_roofline, TPU_PEAKS,
    )
    import jax.numpy as jnp

    def f(x):
        return jnp.sin(x).sum()

    res = benchmark(f, jnp.arange(1024.0), iters=3, warmup=1)
    assert res.mean_s > 0 and res.min_s <= res.mean_s
    assert res.mpix_per_s(100, 100) > 0

    r = rasterizer_roofline(num_pairs=100_000, tile_size=16, chunk_size=128,
                            num_tiles=330)
    assert r.vpu_flops > 0 and r.hbm_bytes > 0 and r.mxu_flops > 0
    peak_f, peak_b, peak_v = TPU_PEAKS["v5e"]
    assert r.bound(peak_f, peak_b, peak_v) > 0
    assert r.binding(peak_f, peak_b, peak_v) in ("mxu", "vpu", "hbm")
    # precision passes scale the MXU term: HIGH must never bound above
    # HIGHEST
    r_high = rasterizer_roofline(num_pairs=100_000, tile_size=16,
                                 chunk_size=128, num_tiles=330,
                                 accum_precision="default")
    assert r_high.bound(peak_f, peak_b, peak_v) <= \
        r.bound(peak_f, peak_b, peak_v)
