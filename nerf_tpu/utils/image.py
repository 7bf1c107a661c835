"""Image IO: float->uint8 conversion and horizontal grid writer.

Parity with the reference's `save_image(..., nrow=1+render_normal+render_depth)`
call sites (/root/reference/train.py:253-255): each eval view produces up to
three panels (rgb | normal | depth) laid out in one row; rows stack views.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np


def to_uint8(img: np.ndarray) -> np.ndarray:
    """[0,1] float (H, W, 3|1) -> uint8 RGB."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[..., None]
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    return (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def make_grid(images: Sequence[np.ndarray], nrow: int = 1,
              pad: int = 2, pad_value: int = 255) -> np.ndarray:
    """Tile images (same H, W) into a grid with ``nrow`` images per row."""
    tiles = [to_uint8(im) for im in images]
    h, w, _ = tiles[0].shape
    nrow = max(1, int(nrow))
    ncol = (len(tiles) + nrow - 1) // nrow
    grid = np.full((ncol * (h + pad) - pad, nrow * (w + pad) - pad, 3),
                   pad_value, np.uint8)
    for i, t in enumerate(tiles):
        r, c = divmod(i, nrow)
        grid[r * (h + pad):r * (h + pad) + h,
             c * (w + pad):c * (w + pad) + w] = t
    return grid


def save_image_grid(path: str, images: Sequence[np.ndarray], nrow: int = 1) -> str:
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(make_grid(images, nrow=nrow)).save(path)
    return path
