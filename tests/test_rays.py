"""Tests for camera / ray generation."""

import numpy as np
import jax.numpy as jnp

from nerf_tpu.core import rays


def test_fov_to_focal_standard_square():
    fov = 0.6911112070083618  # blender lego camera_angle_x
    f = rays.fov_to_focal(fov, (400, 400))
    want = 0.5 * 400 / np.tan(0.5 * fov)
    np.testing.assert_allclose(f, (want, want), rtol=1e-6)


def test_fov_to_focal_legacy_quirk():
    """Reference quirk (utils.py:103-105): square branch drops the 0.5."""
    fov = 0.6911112070083618
    f = rays.fov_to_focal(fov, (400, 400), legacy_square=True)
    want = 400 / np.tan(0.5 * fov)
    np.testing.assert_allclose(f, (want, want), rtol=1e-6)


def test_fov_to_focal_pair():
    f = rays.fov_to_focal((0.8, 0.6), (300, 400))
    np.testing.assert_allclose(
        f, (0.5 * 300 / np.tan(0.3), 0.5 * 400 / np.tan(0.4)), rtol=1e-6
    )


def test_pixel_coord_grid_corners():
    c = np.asarray(rays.pixel_coord_grid(4, 6)).reshape(4, 6, 2)
    # top-left pixel: col 0 - 3 = -3, 2 - row 0 = 2
    np.testing.assert_array_equal(c[0, 0], [-3, 2])
    np.testing.assert_array_equal(c[3, 5], [2, -1])


def test_crop_bounds():
    assert rays.crop_bounds(100, 200, (1.0, 1.0)) == (0, 200, 0, 100)
    assert rays.crop_bounds(100, 200, (0.5, 0.5)) == (50, 150, 25, 75)


def test_identity_camera_center_ray_points_backward():
    """Identity pose: center pixel ray ~ (0, 0, -1)."""
    c2w = jnp.eye(4)[:3]
    r = np.asarray(rays.full_image_rays(4, 4, c2w, (100.0, 100.0))).reshape(4, 4, 6)
    # all origins zero
    np.testing.assert_allclose(r[..., :3], 0.0, atol=1e-7)
    d = r[..., 3:]
    np.testing.assert_allclose(d[..., 2], -1.0, atol=1e-7)
    # x increases with column, y decreases with row
    assert d[0, 3, 0] > d[0, 0, 0]
    assert d[3, 0, 1] < d[0, 0, 1]


def test_rays_rotation_translation():
    """c2w with translation: origin equals translation; direction rotated."""
    rot = np.array([[0, 0, -1], [0, 1, 0], [1, 0, 0]], np.float32)  # yaw 90deg
    t = np.array([1.0, 2.0, 3.0], np.float32)
    c2w = jnp.asarray(np.concatenate([rot, t[:, None]], axis=1))
    coords = jnp.asarray([[-0.5, -0.5]])  # maps to cam dir (0, 0, -1) after +0.5
    r = np.asarray(rays.rays_from_coords(coords, c2w, (10.0, 10.0)))[0]
    np.testing.assert_allclose(r[:3], t, atol=1e-6)
    np.testing.assert_allclose(r[3:], rot @ np.array([0, 0, -1.0]), atol=1e-6)


def test_pose_spherical_orbit_radius_and_lookat():
    """Orbit poses sit at the given radius and look at the origin."""
    for theta in (-180.0, -90.0, 0.0, 45.0):
        pose = rays.pose_spherical(theta, -30.0, 4.0)
        origin = pose[:3, 3]
        np.testing.assert_allclose(np.linalg.norm(origin), 4.0, rtol=1e-5)
        # camera -z axis (view direction) points at the origin
        view = -pose[:3, 2]
        np.testing.assert_allclose(view, -origin / np.linalg.norm(origin), atol=1e-5)


def test_orbit_poses_count():
    p = rays.orbit_poses(120)
    assert p.shape == (120, 4, 4)
    # endpoint excluded: first pose at theta=-180
    np.testing.assert_allclose(p[0], rays.pose_spherical(-180.0, -30.0, 4.0), atol=1e-6)
