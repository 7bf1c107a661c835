"""Blender-synthetic dataset loader.

Capability parity (behavior, not code): /root/reference/nerf/dataset.py:22-114
  - transforms_{train,test}.json with camera_angle_x (optionally _y) and a
    4x4 transform_matrix per frame; optional `division` / `weights` keys from
    the `_div.json` variant written by the pose-division tool
  - natural-sorted PNG listing excluding *normal*/*alpha* files
  - optional ratio-based bilinear resize (AdaptiveResize, dataset.py:22-32)
  - white-background alpha compositing (dataset.py:62)
  - scene-scale applied to the camera translation (dataset.py:64)

TPU-first: the whole dataset is loaded once into host numpy and then staged
to device HBM as one (N, H*W, 3) pixel pool + (N, 3, 4) pose stack — per-step
pixel/ray sampling happens *inside* the jitted train step, so there are no
per-step host->device copies at all (the reference pushes one image per step,
train.py:153-154).
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from nerf_tpu.core.rays import fov_to_focal


def natural_sorted(names):
    """Natural sort ('r_2.png' < 'r_10.png'), replacing the natsort dep."""
    def key(s):
        return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s)]
    return sorted(names, key=key)


def _resize_bilinear(img: np.ndarray, ratio: float) -> np.ndarray:
    """Ratio-based bilinear resize (AdaptiveResize parity, dataset.py:22-32)."""
    if ratio == 1.0:
        return img
    from PIL import Image

    h, w = img.shape[:2]
    new_hw = (int(w * ratio), int(h * ratio))  # PIL takes (w, h)
    arr = (img * 255.0 + 0.5).astype(np.uint8) if img.dtype != np.uint8 else img
    out = np.asarray(
        Image.fromarray(arr).resize(new_hw, Image.BILINEAR), dtype=np.float32
    ) / 255.0
    return out


@dataclass
class BlenderDataset:
    """In-memory Blender-synthetic split.

    images: (N, H, W, 3) float32 in [0, 1]; poses: (N, 3, 4) float32 with
    scene_scale already applied to the translation column.
    """

    images: np.ndarray
    poses: np.ndarray
    fov: object  # float or (fov_x, fov_y)
    division: Optional[list] = None
    weights: Optional[list] = None
    names: list = field(default_factory=list)

    @property
    def image_hw(self):
        return self.images.shape[1], self.images.shape[2]

    def __len__(self):
        return self.images.shape[0]

    def focal(self, legacy_square: bool = False):
        return fov_to_focal(self.fov, self.image_hw, legacy_square=legacy_square)

    def pixel_pool(self) -> np.ndarray:
        """(N, H*W, 3) flattened pixels for on-device sampling."""
        n, h, w, _ = self.images.shape
        return self.images.reshape(n, h * w, 3)

    @classmethod
    def load(cls, root: str, split: str = "train", img_scale: float = 1.0,
             scene_scale: float = 1.0, white_bkg: bool = False,
             use_div: bool = False, use_native: bool = True) -> "BlenderDataset":
        json_name = f"transforms_{split}_div.json" if use_div else f"transforms_{split}.json"
        json_path = os.path.join(root, json_name)
        if not os.path.exists(json_path):
            hint = (" (run tools/pose_division.py to create the _div variant)"
                    if use_div else "")
            raise FileNotFoundError(
                f"dataset not found: {json_path} — expected a Blender-synthetic "
                f"layout <dataset_root>/<dataset_name>/transforms_{split}.json; "
                f"check --dataset_root/--dataset_name{hint}")
        with open(json_path) as f:
            meta = json.load(f)

        fov = meta["camera_angle_x"]
        if "camera_angle_y" in meta:
            fov = (fov, meta["camera_angle_y"])
        division = meta.get("division") if use_div else None
        weights = meta.get("weights") if use_div else None

        img_dir = os.path.join(root, split)
        names = natural_sorted(
            n for n in os.listdir(img_dir)
            if n.endswith("png") and "normal" not in n and "alpha" not in n
        )

        frames = meta["frames"]
        # pair images and poses consistently even when the PNG listing and
        # the frames list disagree in length (a stray extra file must not
        # shift every image onto the wrong camera)
        n = min(len(names), len(frames))
        names, frames = names[:n], frames[:n]
        stacked = None
        if use_native:
            # native C++ decode pipeline (libpng + thread pool); the PIL path
            # below is the oracle and fallback (see nerf_tpu/native)
            from nerf_tpu import native

            stacked = native.decode_images(
                [os.path.join(img_dir, n) for n in names],
                ratio=img_scale, white_bkg=white_bkg)

        if stacked is None:
            from PIL import Image

            images = []
            for name in names:
                img = Image.open(os.path.join(img_dir, name))
                img = img.convert("RGBA" if white_bkg else "RGB")
                arr = np.asarray(img, dtype=np.float32) / 255.0
                arr = _resize_bilinear(arr, img_scale)
                if white_bkg:
                    rgb, a = arr[..., :3], arr[..., 3:]
                    arr = rgb * a + (1.0 - a)
                images.append(arr[..., :3])
            stacked = np.stack(images)

        poses = []
        for frame in frames:
            tf = np.asarray(frame["transform_matrix"], np.float32)[:3, :]
            tf[:, 3] *= scene_scale
            poses.append(tf)

        return cls(
            images=stacked.astype(np.float32),
            poses=np.stack(poses).astype(np.float32),
            fov=fov,
            division=division,
            weights=weights,
            names=names,
        )
