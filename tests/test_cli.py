"""End-to-end CLI surface tests.

Runs the actual `gstpu` entry points (cli.main) against a fully synthetic
COLMAP scene with ground-truth images on disk
(io/synthetic.make_colmap_scene(write_images=True)) -- the offline
substitute for the reference's network-fetched treehill dataset
(/root/reference/get_data.sh:1). Covers: train (PSNR climbs, artifacts
appear), eval (PSNR/SSIM table incl. holdout protocol), render/points/
info, and fetch (offline via injected transport).
"""

import io
import os
import re
import zipfile

import numpy as np
import pytest

from intro_to_gaussian_splatting_tpu import cli
from intro_to_gaussian_splatting_tpu.io.synthetic import make_colmap_scene


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("scene"))
    make_colmap_scene(d, num_points=300, num_cameras=3, width=64, height=48,
                      seed=5, write_images=True)
    return d


def test_info_and_render_and_points(scene_dir, tmp_path, capsys):
    assert cli.main(["info", scene_dir]) == 0
    out = capsys.readouterr().out
    assert "cameras: 1" in out and "points3D: 300" in out

    render_path = str(tmp_path / "r.ppm")
    assert cli.main(["render", scene_dir, "-o", render_path]) == 0
    with open(render_path, "rb") as f:
        assert f.readline() == b"P6\n"
        assert f.readline() == b"64 48\n"

    pts_path = str(tmp_path / "p.ppm")
    assert cli.main(["points", scene_dir, "-o", pts_path]) == 0
    assert os.path.exists(pts_path)


def test_train_then_eval_end_to_end(scene_dir, tmp_path, capsys):
    """`gstpu train` improves PSNR and writes ckpt+ply+render; `gstpu eval`
    scores the result on the holdout views."""
    out_dir = str(tmp_path / "out")
    rc = cli.main(["train", scene_dir, "--iterations", "60",
                   "--out-dir", out_dir, "--holdout", "3",
                   "--eval-at-end"])
    assert rc == 0
    out = capsys.readouterr().out

    # training logs: "step N: loss L psnr P active A"
    steps = re.findall(r"step (\d+): loss ([\d.]+) psnr ([-\d.]+)", out)
    assert len(steps) >= 2, out
    first_loss, last_loss = float(steps[0][1]), float(steps[-1][1])
    first_psnr, last_psnr = float(steps[0][2]), float(steps[-1][2])
    assert last_loss < first_loss, out
    assert last_psnr > first_psnr, out

    # artifacts
    assert os.path.exists(os.path.join(out_dir, "point_cloud.ply"))
    assert os.path.exists(os.path.join(out_dir, "render.ppm"))
    ckpt = os.path.join(out_dir, "ckpt")
    assert any(d.startswith("step_") for d in os.listdir(ckpt))

    # end-of-train holdout eval line
    ev = re.findall(r"eval\[holdout\]\s+(\S+)\s+psnr\s+([-\d.]+)\s+ssim"
                    r"\s+([-\d.]+)", out)
    assert ev, out
    assert float(ev[-1][1]) > 10.0   # mean PSNR on held-out view

    # standalone eval on the exported PLY, holdout protocol
    rc = cli.main(["eval", scene_dir,
                   "--ply", os.path.join(out_dir, "point_cloud.ply"),
                   "--holdout", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    rows = re.findall(r"(\S+)\s+psnr\s+([-\d.]+)\s+ssim\s+([-\d.]+)", out)
    assert rows and rows[-1][0] == "mean", out
    assert float(rows[-1][1]) > 10.0
    assert -1.0 <= float(rows[-1][2]) <= 1.0


def test_train_checkpoint_resume(scene_dir, tmp_path, capsys):
    """Failure-recovery surface: train with periodic checkpoints, 'crash',
    resume from the last checkpoint, finish the budget. Step numbering
    continues and the final PSNR does not regress vs the interrupted run
    (the multihost recovery story in parallel/multihost.py:12-16,
    demonstrated rather than asserted)."""
    out_dir = str(tmp_path / "out")
    rc = cli.main(["train", scene_dir, "--iterations", "6",
                   "--out-dir", out_dir, "--checkpoint-every", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    ckpt = os.path.join(out_dir, "ckpt")
    from intro_to_gaussian_splatting_tpu.train.checkpoint import (
        list_checkpoint_steps,
    )
    # periodic saves at 3 and 6, plus the end-of-run save (step 6 again)
    assert 3 in list_checkpoint_steps(ckpt)
    assert 6 in list_checkpoint_steps(ckpt)
    steps = re.findall(r"step (\d+): loss ([\d.]+) psnr ([-\d.]+)", out)
    psnr_at_interrupt = float(steps[-1][2])

    # resume with a larger total budget: must CONTINUE from step 6
    rc = cli.main(["train", scene_dir, "--iterations", "12",
                   "--out-dir", out_dir, "--checkpoint-every", "3",
                   "--resume"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "resumed from step 6 (6 iterations remaining)" in out, out
    steps = re.findall(r"step (\d+): loss ([\d.]+) psnr ([-\d.]+)", out)
    assert steps, out
    # step counter continued past the restore point
    assert int(steps[0][0]) > 6
    assert int(steps[-1][0]) == 12
    # optimization continued: PSNR does not regress vs the interrupted run
    assert float(steps[-1][2]) >= psnr_at_interrupt - 0.5, out
    # a fully-budget-consumed resume is a no-op, not an error
    rc = cli.main(["train", scene_dir, "--iterations", "12",
                   "--out-dir", out_dir, "--resume"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "resumed from step 12 (0 iterations remaining)" in out, out


def test_checkpoint_retention(tmp_path):
    from intro_to_gaussian_splatting_tpu.train.checkpoint import (
        list_checkpoint_steps, prune_checkpoints,
    )
    d = str(tmp_path / "ck")
    for s in (10, 20, 30, 40):
        os.makedirs(os.path.join(d, f"step_{s}"))
    prune_checkpoints(d, keep=2)
    assert list_checkpoint_steps(d) == [30, 40]
    prune_checkpoints(d, keep=0)   # keep=0 means no pruning
    assert list_checkpoint_steps(d) == [30, 40]


def test_eval_save_renders(scene_dir, tmp_path, capsys):
    out_dir = str(tmp_path / "out")
    cli.main(["train", scene_dir, "--iterations", "5", "--out-dir", out_dir])
    capsys.readouterr()
    renders = str(tmp_path / "renders")
    rc = cli.main(["eval", scene_dir,
                   "--ply", os.path.join(out_dir, "point_cloud.ply"),
                   "--save-renders", renders])
    assert rc == 0
    assert len(os.listdir(renders)) == 3


def _fake_urlopen_for(payload: bytes):
    class _Resp:
        status = 200
        headers = {"Content-Length": str(len(payload))}

        def __init__(self):
            self._buf = io.BytesIO(payload)

        def read(self, n):
            return self._buf.read(n)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake(req, timeout=None):
        return _Resp()

    return fake


def test_fetch_extracts_zip(tmp_path):
    """fetch_dataset with an injected transport: downloads, checksums,
    extracts; no network touched."""
    from intro_to_gaussian_splatting_tpu.io.fetch import fetch_dataset

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("treehill/sparse/0/cameras.txt", "# empty\n")
    out = str(tmp_path / "data")
    fetch_dataset("360_extra", out, _urlopen=_fake_urlopen_for(buf.getvalue()))
    assert os.path.exists(os.path.join(out, "treehill", "sparse", "0",
                                       "cameras.txt"))


def test_fetch_unknown_dataset():
    from intro_to_gaussian_splatting_tpu.io.fetch import fetch_dataset
    with pytest.raises(ValueError):
        fetch_dataset("nope", ".")


def test_fetch_offline_error(tmp_path):
    """Zero-egress: a clean RuntimeError pointing at the synthetic
    generator, not a hang or a stack trace."""
    from intro_to_gaussian_splatting_tpu.io.fetch import fetch_dataset

    def dead(req, timeout=None):
        raise OSError("Network is unreachable")

    with pytest.raises(RuntimeError, match="synthetic"):
        fetch_dataset("360_extra", str(tmp_path), _urlopen=dead)
