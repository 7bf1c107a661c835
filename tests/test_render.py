"""Tests for transmittance weights and compositing."""

import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.core import render


def np_weights(density, zvals, act=lambda x: np.maximum(x, 0)):
    """Independent cumprod formulation (mirrors nerf_base.py:79-86)."""
    delta = np.concatenate(
        [zvals[:, 1:] - zvals[:, :-1], np.full((zvals.shape[0], 1), 1e10)], -1
    )
    mult = np.exp(-act(density) * delta)
    alpha = 1.0 - mult
    cp = np.cumprod(np.concatenate([np.ones((alpha.shape[0], 1)), mult + 1e-10], -1), -1)
    return alpha * cp[:, :-1]


def test_weights_match_cumprod_oracle(rng):
    density = rng.standard_normal((8, 64)).astype(np.float32) * 2
    zvals = np.sort(rng.uniform(2, 6, (8, 64)).astype(np.float32), -1)
    got = np.asarray(render.transmittance_weights(jnp.asarray(density), jnp.asarray(zvals)))
    want = np_weights(density, zvals)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_weights_sum_below_one(rng):
    density = np.abs(rng.standard_normal((4, 32)).astype(np.float32))
    zvals = np.sort(rng.uniform(2, 6, (4, 32)).astype(np.float32), -1)
    w = np.asarray(render.transmittance_weights(jnp.asarray(density), jnp.asarray(zvals)))
    assert np.all(w >= 0)
    # the 1e-10 cumprod epsilon (reference parity) can inflate the sum a hair
    assert np.all(w.sum(-1) <= 1.0 + 1e-4)


def test_weights_final_delta_override():
    """final_delta replaces the 1e10 sentinel on the LAST sample only.

    A tiny residual density (1e-9) at the far plane saturates the sentinel
    bin (alpha ~1-exp(-10)) but must contribute ~nothing under an honest
    final bin width — the GT-generation mode (synthetic.render_gt_image)."""
    density = jnp.concatenate(
        [jnp.zeros((1, 7)), jnp.full((1, 1), 1e-9)], axis=-1)
    zvals = jnp.linspace(2.0, 6.0, 8)[None]
    w_sentinel = np.asarray(render.transmittance_weights(
        density, zvals, density_act=lambda x: x))
    assert w_sentinel[0, -1] > 0.9  # the unfittable halo mechanism
    w_honest = np.asarray(render.transmittance_weights(
        density, zvals, density_act=lambda x: x, final_delta=0.5))
    assert w_honest[0, -1] < 1e-8
    # earlier samples are untouched
    np.testing.assert_allclose(w_honest[0, :-1], w_sentinel[0, :-1])
    # per-ray array final_delta broadcasts like the zvals
    w_arr = np.asarray(render.transmittance_weights(
        jnp.tile(density, (3, 1)), jnp.tile(zvals, (3, 1)),
        density_act=lambda x: x,
        final_delta=jnp.full((3, 1), 0.5)))
    np.testing.assert_allclose(w_arr, np.tile(w_honest, (3, 1)))


def test_gt_render_has_no_sentinel_halo():
    """GT images must not contain the dark silhouette-halo artifact.

    With the sentinel, grazing rays past a blob kept density ~1e-10 at the
    far plane and composited ~0.98 alpha of near-black (the round-3/4
    "16.0-PSNR pose"); with the honest final bin the background around the
    object silhouette stays white and no pixel drops below the darkest
    achievable blob-mixture color (every blob channel >= 0.1)."""
    from nerf_tpu.data.synthetic import _scene_params, render_gt_image
    import nerf_tpu.core.rays as rays_lib

    scene = _scene_params(0)
    pose = np.asarray(rays_lib.pose_spherical(-25.3, -20.7, 4.0))
    img = render_gt_image(scene, pose, (32, 32),
                          rays_lib.fov_to_focal(0.69, (32, 32)),
                          n_samples=96)
    assert img.min() >= 0.095, f"dark-halo artifact: min={img.min():.4f}"
    # corner pixels see no blob at all -> exactly background white
    assert img[0, 0].min() > 0.999


def test_opaque_wall_collapses_to_first_sample():
    """Huge density at the first sample -> weight ~1 there, ~0 after."""
    density = jnp.full((1, 8), 1e4)
    zvals = jnp.linspace(2, 6, 8)[None]
    w = np.asarray(render.transmittance_weights(density, zvals))
    assert w[0, 0] > 0.99
    assert np.all(w[0, 1:] < 1e-3)


def test_composite_white_background():
    """Zero density everywhere + white_bkg -> pure white output."""
    rgb = jnp.zeros((2, 16, 3))
    density = jnp.full((2, 16), -10.0)  # relu -> 0
    zvals = jnp.broadcast_to(jnp.linspace(2, 6, 16), (2, 16))
    dirs = jnp.asarray([[0.0, 0.0, -1.0]] * 2)
    out, w, _ = render.composite(rgb, density, zvals, dirs, white_bkg=True)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(w), 0.0, atol=1e-6)


def test_composite_ray_norm_scaling():
    """Doubling ||d|| doubles the metric deltas -> higher opacity."""
    rgb = jnp.ones((1, 16, 3)) * 0.5
    density = jnp.full((1, 16), 0.5)
    zvals = jnp.broadcast_to(jnp.linspace(2, 6, 16), (1, 16))
    d1 = jnp.asarray([[0.0, 0.0, -1.0]])
    d2 = jnp.asarray([[0.0, 0.0, -2.0]])
    _, w1, _ = render.composite(rgb, density, zvals, d1)
    _, w2, _ = render.composite(rgb, density, zvals, d2)
    # more accumulated opacity early with the longer direction vector
    assert float(w2[0, 0]) > float(w1[0, 0])


def test_composite_depth_extra():
    """Opaque wall at z=4 -> normalized depth = (4*||d|| - near)/(far-near)."""
    density = jnp.where(jnp.arange(64) == 32, 1e5, 0.0)[None].repeat(1, 0)
    zvals = jnp.linspace(2, 6, 64)[None]
    rgb = jnp.ones((1, 64, 3))
    dirs = jnp.asarray([[0.0, 0.0, -1.0]])
    _, _, extras = render.composite(rgb, density, zvals, dirs, depth_bounds=(2.0, 6.0))
    z_wall = float(zvals[0, 32])
    np.testing.assert_allclose(float(extras["depth"][0]), (z_wall - 2.0) / 4.0, atol=1e-3)


def test_composite_normal_extra():
    density = jnp.full((1, 8), 1e5)  # everything at the first sample
    zvals = jnp.linspace(2, 6, 8)[None]
    rgb = jnp.ones((1, 8, 3))
    dirs = jnp.asarray([[0.0, 0.0, -1.0]])
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (1, 8, 3))
    cam_dir = jnp.asarray([0.0, 0.0, 1.0])
    _, _, extras = render.composite(
        rgb, density, zvals, dirs, normal_info=(normal, cam_dir)
    )
    # n . cam = 1 -> mapped to (1+1)/2 = 1
    np.testing.assert_allclose(float(extras["normal"][0]), 1.0, atol=1e-3)


def test_composite_rl_matches_composite():
    """The ROW-LAND train-path composite ((3, R, P) radiance, the layout
    that keeps points on VPU lanes) equals ``composite`` in values AND in
    the radiance/density gradients the train step differentiates."""
    import jax

    rng = np.random.default_rng(4)
    r, p = 6, 17
    rgb = jnp.asarray(rng.uniform(size=(r, p, 3)).astype(np.float32))
    den = jnp.asarray(rng.normal(size=(r, p)).astype(np.float32))
    zv = jnp.asarray(np.sort(rng.uniform(1, 5, (r, p))).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(r, 3)).astype(np.float32))

    for wb in (False, True):
        def f_plain(rgb_, den_):
            out, w, _ = render.composite(rgb_, den_, zv, dirs, white_bkg=wb)
            return jnp.sum(out ** 2) + jnp.sum(w ** 3)

        def f_rl(rgb_, den_):
            out, w = render.composite_rl(jnp.moveaxis(rgb_, -1, 0), den_,
                                         zv, dirs, white_bkg=wb)
            return jnp.sum(out ** 2) + jnp.sum(w ** 3)

        (vp, gp), (vr, gr) = (jax.value_and_grad(f, argnums=(0, 1))(rgb, den)
                              for f in (f_plain, f_rl))
        np.testing.assert_allclose(float(vp), float(vr), rtol=1e-6)
        for a, b in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)


def test_mse_to_psnr():
    np.testing.assert_allclose(float(render.mse_to_psnr(jnp.asarray(0.01))), 20.0, atol=1e-4)


def test_lengths_to_points():
    rays = jnp.asarray([[1.0, 2.0, 3.0, 0.0, 0.0, -1.0]])
    z = jnp.asarray([[2.0, 4.0]])
    pts = np.asarray(render.lengths_to_points(rays, z))
    np.testing.assert_allclose(pts, [[[1, 2, 1], [1, 2, -1]]], atol=1e-6)
