"""Scene dataset loading: COLMAP model + ground-truth images.

The reference loads its scene inline in each notebook (read_image_file /
read_camera_file at /root/reference/splat/read_colmap.py:89-107, image
decode via PIL in the notebooks); here the train AND eval CLI surfaces
share one loader that pairs every COLMAP image record with its decoded
ground-truth photo (when present on disk) and the matching Camera pytree.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import numpy as np

from intro_to_gaussian_splatting_tpu.models.camera import Camera


@dataclasses.dataclass
class SceneData:
    """One COLMAP scene with decoded ground truth.

    cameras[i] / targets[i] / names[i] line up; targets are float32
    (H, W, 3) in [0, 1]. ``points`` is the track-filtered sparse cloud
    used for gaussian init.
    """

    cameras: List[Camera]
    targets: List[np.ndarray]
    names: List[str]
    points: "object"          # io.colmap.ColmapPoints

    def split_holdout(self, every: int):
        """(train, holdout) split: every ``every``-th view is held out
        (standard Mip-NeRF-360 protocol uses every 8th). ``every<=0``
        returns (self, empty)."""
        tr_idx = [i for i in range(len(self.cameras))
                  if every <= 0 or i % every != 0]
        ho_idx = [i for i in range(len(self.cameras))
                  if every > 0 and i % every == 0]

        def pick(idx):
            return SceneData(
                cameras=[self.cameras[i] for i in idx],
                targets=[self.targets[i] for i in idx],
                names=[self.names[i] for i in idx],
                points=self.points)

        return pick(tr_idx), pick(ho_idx)


def resolve_sparse(path: str) -> str:
    """Find the COLMAP model dir under ``path`` (accepts the scene root,
    ``sparse`` or ``sparse/0`` itself)."""
    for cand in (path, os.path.join(path, "sparse", "0"),
                 os.path.join(path, "sparse"), os.path.join(path, "0")):
        if os.path.exists(os.path.join(cand, "cameras.bin")) or \
           os.path.exists(os.path.join(cand, "cameras.txt")):
            return cand
    raise FileNotFoundError(f"no COLMAP model found under {path}")


def load_scene(scene_dir: str, downscale: int = 1, min_track: int = 2,
               image_dir: Optional[str] = None,
               require_images: bool = True) -> SceneData:
    """Load a COLMAP scene plus its ground-truth images.

    Images are searched under ``<scene_dir>/images`` (the Mip-NeRF-360 /
    get_data.sh layout) and decoded with PIL at the camera's (downscaled)
    resolution. Images missing on disk are skipped; with
    ``require_images=False`` a missing photo yields ``targets[i] = None``
    (render-only flows such as ``gstpu eval --save-renders``).
    """
    from intro_to_gaussian_splatting_tpu.io import read_model
    from intro_to_gaussian_splatting_tpu.models import camera_from_colmap

    sparse = resolve_sparse(scene_dir)
    cameras, images, points = read_model(sparse)
    points = points.filter_by_track_length(min_track)

    if image_dir is None:
        # the model may live at <scene>/sparse/0; images are a sibling of
        # sparse/, i.e. under the scene root. Numeric components are only
        # stripped when they sit under a "sparse" dir -- a scene whose OWN
        # directory name is numeric (e.g. /data/360 holding cameras.bin
        # directly) must keep its images at <scene>/images, not the parent's
        root = os.path.normpath(sparse)
        probe = root
        while os.path.basename(probe).isdigit():
            probe = os.path.dirname(probe)
        if os.path.basename(probe) == "sparse":
            root = os.path.dirname(probe)
        image_dir = os.path.join(root, "images")

    from PIL import Image as PILImage

    cams, targets, names = [], [], []
    for iid in sorted(images.keys()):
        im = images[iid]
        cam = camera_from_colmap(cameras[im.camera_id], im, downscale)
        path = os.path.join(image_dir, im.name)
        if os.path.exists(path):
            pil = PILImage.open(path).resize((cam.width, cam.height))
            target = np.asarray(pil, dtype=np.float32)[..., :3] / 255.0
        elif require_images:
            continue
        else:
            target = None
        cams.append(cam)
        targets.append(target)
        names.append(im.name)
    return SceneData(cameras=cams, targets=targets, names=names,
                     points=points)
