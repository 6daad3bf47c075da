import os

import numpy as np
import pytest

from intro_to_gaussian_splatting_tpu.io import colmap as C
from intro_to_gaussian_splatting_tpu.io.ply import read_ply, write_ply
from intro_to_gaussian_splatting_tpu.io.synthetic import make_colmap_scene


def test_colmap_binary_roundtrip(tmp_path):
    sparse = make_colmap_scene(str(tmp_path), num_points=200, num_cameras=3)
    cameras, images, points = C.read_model(sparse)

    assert len(cameras) == 1
    cam = cameras[1]
    assert cam.model == "PINHOLE"
    assert cam.width == 128 and cam.height == 96
    assert cam.fx == cam.params[0] and cam.cy == cam.params[3]

    assert len(images) == 3
    im = images[1]
    assert im.name == "im_0001.png"
    np.testing.assert_allclose(np.linalg.norm(im.qvec), 1.0, atol=1e-6)
    assert im.xys.shape == (100, 2)
    assert im.point3D_ids.min() >= 1

    assert len(points) == 200
    assert points.rgb.dtype == np.uint8
    assert points.track_lengths.sum() == len(points.track_image_ids)


def test_colmap_roundtrip_exact(tmp_path):
    sparse = make_colmap_scene(str(tmp_path), num_points=50, num_cameras=2)
    cameras, images, points = C.read_model(sparse)
    # write back and re-read: must be identical
    d2 = tmp_path / "copy"
    d2.mkdir()
    C.write_cameras_binary(cameras, str(d2 / "cameras.bin"))
    C.write_images_binary(images, str(d2 / "images.bin"))
    C.write_points3D_binary(points, str(d2 / "points3D.bin"))
    c2, i2, p2 = C.read_model(str(d2))
    np.testing.assert_array_equal(c2[1].params, cameras[1].params)
    np.testing.assert_array_equal(i2[2].qvec, images[2].qvec)
    np.testing.assert_array_equal(i2[2].point3D_ids, images[2].point3D_ids)
    np.testing.assert_array_equal(p2.xyz, points.xyz)
    np.testing.assert_array_equal(p2.track_image_ids, points.track_image_ids)


def test_colmap_matches_reference_parser(tmp_path):
    """Our parser and the reference's struct-loop parser agree bit-for-bit."""
    ref = pytest.importorskip("tests.reference_oracle", reason="no reference")
    splat = ref.load_reference()
    sparse = make_colmap_scene(str(tmp_path), num_points=120, num_cameras=2)

    ours_cams = C.read_cameras(sparse)
    ref_cams = splat.read_colmap.read_cameras_binary(
        os.path.join(sparse, "cameras.bin"))
    assert set(ours_cams) == set(ref_cams)
    for k in ours_cams:
        np.testing.assert_array_equal(ours_cams[k].params, ref_cams[k].params)
        assert ours_cams[k].model == ref_cams[k].model
        assert (ours_cams[k].width, ours_cams[k].height) == (
            ref_cams[k].width, ref_cams[k].height)

    ours_ims = C.read_images(sparse)
    ref_ims = splat.read_colmap.read_images_binary(
        os.path.join(sparse, "images.bin"))
    assert set(ours_ims) == set(ref_ims)
    for k in ours_ims:
        np.testing.assert_array_equal(ours_ims[k].qvec, ref_ims[k].qvec)
        np.testing.assert_array_equal(ours_ims[k].tvec, ref_ims[k].tvec)
        np.testing.assert_array_equal(ours_ims[k].xys, ref_ims[k].xys)
        np.testing.assert_array_equal(
            ours_ims[k].point3D_ids, ref_ims[k].point3D_ids)
        assert ours_ims[k].name == ref_ims[k].name

    ours_pts = C.read_points3D(sparse)
    ref_pts = splat.read_colmap.read_points3D_binary(
        os.path.join(sparse, "points3D.bin"))
    assert len(ours_pts) == len(ref_pts)
    for i, pid in enumerate(ours_pts.ids):
        np.testing.assert_array_equal(ours_pts.xyz[i], ref_pts[pid].xyz)
        np.testing.assert_array_equal(ours_pts.rgb[i], ref_pts[pid].rgb)


def test_track_filter(tmp_path):
    sparse = make_colmap_scene(str(tmp_path), num_points=100, num_cameras=4)
    points = C.read_points3D(sparse)
    filtered = points.filter_by_track_length(3)
    assert np.all(filtered.track_lengths >= 3)
    assert filtered.track_lengths.sum() == len(filtered.track_image_ids)


def test_text_readers(tmp_path):
    (tmp_path / "cameras.txt").write_text(
        "# comment\n1 PINHOLE 64 48 50.0 50.0 32.0 24.0\n")
    (tmp_path / "images.txt").write_text(
        "# comment\n"
        "1 1.0 0.0 0.0 0.0 0.5 -0.25 2.0 1 a.png\n"
        "10.0 20.0 5 30.0 40.0 -1\n")
    (tmp_path / "points3D.txt").write_text(
        "# comment\n7 1.0 2.0 3.0 10 20 30 0.5 1 0 2 1\n")
    cams = C.read_cameras(str(tmp_path))
    assert cams[1].model == "PINHOLE" and cams[1].fx == 50.0
    ims = C.read_images(str(tmp_path))
    assert ims[1].camera_id == 1 and ims[1].name == "a.png"
    np.testing.assert_array_equal(ims[1].point3D_ids, [5, -1])
    pts = C.read_points3D(str(tmp_path))
    assert pts.ids[0] == 7 and pts.track_lengths[0] == 2
    np.testing.assert_array_equal(pts.rgb[0], [10, 20, 30])


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(17, 3)).astype(np.float32)
    rgb = rng.integers(0, 256, size=(17, 3)).astype(np.uint8)
    path = str(tmp_path / "pc.ply")
    write_ply(path, xyz, rgb)
    data = read_ply(path)
    np.testing.assert_allclose(
        np.stack([data["x"], data["y"], data["z"]], 1), xyz, rtol=1e-6)
    np.testing.assert_array_equal(
        np.stack([data["red"], data["green"], data["blue"]], 1), rgb)


def test_ply_extra_properties(tmp_path):
    xyz = np.zeros((4, 3), np.float32)
    extra = {"opacity": np.arange(4, dtype=np.float32),
             "f_dc": np.ones((4, 3), np.float32) * 0.25}
    path = str(tmp_path / "gs.ply")
    write_ply(path, xyz, extra=extra)
    data = read_ply(path)
    np.testing.assert_array_equal(data["opacity"], extra["opacity"])
    np.testing.assert_array_equal(data["f_dc_2"], extra["f_dc"][:, 2])


def test_load_scene_accepts_sparse_dir_directly(tmp_path):
    """Passing <scene>/sparse/0 (or <scene>/sparse) as the scene dir must
    still find <scene>/images -- the image root is derived by walking up
    from the RESOLVED sparse dir, not from the argument as given."""
    from intro_to_gaussian_splatting_tpu.io.dataset import load_scene
    from intro_to_gaussian_splatting_tpu.io.synthetic import make_colmap_scene

    root = str(tmp_path / "scene")
    make_colmap_scene(root, num_points=120, num_cameras=2, width=48,
                      height=32, seed=2, write_images=True)
    for arg in (root, root + "/sparse", root + "/sparse/0"):
        scene = load_scene(arg)
        assert len(scene.cameras) == 2, arg
        assert all(t is not None for t in scene.targets), arg
        assert scene.targets[0].shape == (32, 48, 3)


def test_load_scene_numeric_scene_root(tmp_path):
    """A scene whose OWN directory name is numeric (e.g. /data/360) with
    the model files directly inside must resolve images to <scene>/images,
    not the parent's: only numeric components UNDER a 'sparse' dir are
    stripped when deriving the image root."""
    import shutil

    from intro_to_gaussian_splatting_tpu.io.dataset import load_scene
    from intro_to_gaussian_splatting_tpu.io.synthetic import make_colmap_scene

    staged = str(tmp_path / "staged")
    make_colmap_scene(staged, num_points=100, num_cameras=2, width=48,
                      height=32, seed=3, write_images=True)
    root = tmp_path / "360"           # numeric scene dir
    root.mkdir()
    for f in (tmp_path / "staged" / "sparse" / "0").iterdir():
        shutil.copy(f, root / f.name)           # model files directly inside
    shutil.copytree(str(tmp_path / "staged" / "images"),
                    str(root / "images"))
    # a DIFFERENT decoy images dir at the parent level must NOT be used
    (tmp_path / "images").mkdir()

    scene = load_scene(str(root))
    assert len(scene.cameras) == 2
    assert all(t is not None for t in scene.targets)
