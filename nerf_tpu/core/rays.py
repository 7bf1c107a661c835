"""Camera model and ray generation.

Capability parity with the reference (cited for behavior, not code):
  - focal-from-fov:        /root/reference/nerf/utils.py:96-105 (``fov2Focal``)
  - pixel->ray generation: /root/reference/nerf/utils.py:72-94 (``validSampler``)
    and /root/reference/nerf/procedures.py:43-51 (full-image meshgrid rays)
  - orbit poses:           /root/reference/nerf/utils.py:136-158 (``pose_spherical``)

Conventions (identical to the reference): pinhole camera looking down -z in
camera space; pixel coordinates are centered ((col - W/2 + 0.5, H/2 - row - 0.5)
after the half-pixel shift), divided by focal length; ray directions are
R @ [x, y, -1] and are *not* normalized — depth values are z-distances that
get scaled by ||d|| at composite time.

Known reference quirk (utils.py:96-105): for square images the reference
computes ``focal = W / tan(fov/2)`` — missing the standard 0.5 factor, i.e.
half the intended field of view.  ``fov_to_focal`` implements the correct
pinhole formula by default; pass ``legacy_square=True`` to reproduce the
reference numerics exactly.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import jax


def fov_to_focal(fov, image_hw, legacy_square: bool = False):
    """fov (radians) -> (focal_row, focal_col) in pixels.

    ``fov`` may be a scalar (camera_angle_x) or a (fov_x, fov_y) pair.
    ``image_hw`` is (rows, cols). Mirrors reference utils.py:96-105 including
    the row/col ordering of the returned pair.
    """
    h, w = int(image_hw[0]), int(image_hw[1])
    if isinstance(fov, (tuple, list)):
        fov_x, fov_y = float(fov[0]), float(fov[1])
        return (0.5 * h / np.tan(0.5 * fov_y), 0.5 * w / np.tan(0.5 * fov_x))
    fov = float(fov)
    if legacy_square and h == w:
        focal = h / np.tan(0.5 * fov)  # reference quirk: missing 0.5
        return (focal, focal)
    focal = 0.5 * w / np.tan(0.5 * fov)
    return (focal, focal)


def pixel_coord_grid(h: int, w: int) -> jnp.ndarray:
    """Centered (x, y) coordinates for every pixel, flattened to (H*W, 2).

    Matches reference utils.py:47-69: x = col - W//2, y = H//2 - row
    (the +0.5 half-pixel shift is applied later at ray-gen time, matching
    utils.py:76-80).
    """
    half_w, half_h = w // 2, h // 2
    rows = jnp.arange(h, dtype=jnp.int32)
    cols = jnp.arange(w, dtype=jnp.int32)
    row_ids, col_ids = jnp.meshgrid(rows, cols, indexing="ij")
    coords = jnp.stack((col_ids - half_w, half_h - row_ids), axis=-1)
    return coords.reshape(-1, 2)


def crop_bounds(h: int, w: int, crop_xy) -> tuple:
    """Center-crop window [x_lb, x_ub) x [y_lb, y_ub) as in utils.py:47-63."""
    half_w, half_h = w // 2, h // 2
    cx, cy = crop_xy
    if cx < 0.99:
        x_lb, x_ub = int(half_w * (1.0 - cx)), int(half_w + half_w * cx)
    else:
        x_lb, x_ub = 0, w
    if cy < 0.99:
        y_lb, y_ub = int(half_h * (1.0 - cy)), int(half_h + half_h * cy)
    else:
        y_lb, y_ub = 0, h
    return x_lb, x_ub, y_lb, y_ub


def rays_from_coords(coords: jnp.ndarray, c2w: jnp.ndarray, focal) -> jnp.ndarray:
    """Centered pixel coords (N, 2) + camera-to-world (3, 4) -> rays (N, 6).

    Rays are (origin | direction); direction unnormalized, camera -z forward.
    Behavior parity: reference utils.py:76-85.
    """
    coords = coords.astype(jnp.float32) + 0.5
    f_row, f_col = focal
    xy = coords / jnp.asarray([f_col, f_row], dtype=jnp.float32)
    d_cam = jnp.concatenate(
        [xy, -jnp.ones((*xy.shape[:-1], 1), dtype=jnp.float32)], axis=-1
    )
    # direction = R @ d_cam ; R = c2w[:, :3]
    d_world = d_cam @ c2w[:, :3].T
    origin = jnp.broadcast_to(c2w[:, 3], d_world.shape)
    return jnp.concatenate([origin, d_world], axis=-1)


def full_image_rays(h: int, w: int, c2w: jnp.ndarray, focal) -> jnp.ndarray:
    """Rays for every pixel of an (h, w) image, shape (h*w, 6).

    Matches the eval-path meshgrid ray generation (procedures.py:43-51):
    coords are (col - W/2 + 0.5, H/2 - row + ... ) — note the eval path
    uses float image_size/2 rather than integer halves; for even image sizes
    (the only sizes the reference renders) the two are identical.
    """
    return rays_from_coords(pixel_coord_grid(h, w), c2w, focal)


def _rot_x(phi: float) -> np.ndarray:
    c, s = np.cos(phi), np.sin(phi)
    return np.array([[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]], np.float32)


def _rot_y(th: float) -> np.ndarray:
    c, s = np.cos(th), np.sin(th)
    return np.array([[c, 0, -s, 0], [0, 1, 0, 0], [s, 0, c, 0], [0, 0, 0, 1]], np.float32)


def pose_spherical(theta_deg: float, phi_deg: float, radius: float) -> np.ndarray:
    """Orbit camera pose, 4x4 c2w. Behavior parity: utils.py:136-158."""
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = radius
    c2w = _rot_x(phi_deg / 180.0 * np.pi) @ c2w
    c2w = _rot_y(theta_deg / 180.0 * np.pi) @ c2w
    flip = np.array(
        [[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], np.float32
    )
    return flip @ c2w


def orbit_poses(n: int = 120, phi_deg: float = -30.0, radius: float = 4.0) -> np.ndarray:
    """The reference's 120-pose render orbit (procedures.py:127)."""
    angles = np.linspace(-180.0, 180.0, n + 1)[:-1]
    return np.stack([pose_spherical(a, phi_deg, radius) for a in angles], axis=0)
