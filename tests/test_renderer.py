"""Eval renderer tests: shapes, chunk-size invariance, extras."""

import numpy as np
import jax

from nerf_tpu.core import rays as rays_lib
from nerf_tpu.train.config import PipelineConfig
from nerf_tpu.train.pipeline import init_variables
from nerf_tpu.train.renderer import render_image

CFG = PipelineConfig(n_coarse=16, n_fine=16, nerf_width=32, prop_width=32,
                     white_bkg=True)


def test_render_image_shapes_and_chunk_invariance():
    cfg = CFG
    params = init_variables(cfg, jax.random.PRNGKey(0))
    pose = rays_lib.pose_spherical(30.0, -30.0, 4.0)
    focal = rays_lib.fov_to_focal(0.69, (20, 20))
    out1 = render_image(params, pose, (20, 20), focal, cfg, chunk=100)
    out2 = render_image(params, pose, (20, 20), focal, cfg, chunk=400)
    assert out1["rgb"].shape == (20, 20, 3)
    np.testing.assert_allclose(out1["rgb"], out2["rgb"], atol=1e-5)


def test_render_image_ref_extras():
    cfg = CFG.replace(model="ref", nerf_width=32)
    params = init_variables(cfg, jax.random.PRNGKey(0))
    pose = rays_lib.pose_spherical(0.0, -30.0, 4.0)
    focal = rays_lib.fov_to_focal(0.69, (16, 16))
    out = render_image(params, pose, (16, 16), focal, cfg, chunk=64,
                       render_depth=True, render_normal=True)
    assert out["rgb"].shape == (16, 16, 3)
    assert out["depth"].shape == (16, 16)
    assert out["normal"].shape == (16, 16)
    for v in out.values():
        assert np.all(np.isfinite(v))


def test_render_normal_ignored_for_vanilla():
    cfg = CFG
    params = init_variables(cfg, jax.random.PRNGKey(0))
    pose = rays_lib.pose_spherical(0.0, -30.0, 4.0)
    focal = rays_lib.fov_to_focal(0.69, (16, 16))
    out = render_image(params, pose, (16, 16), focal, cfg, chunk=64,
                       render_normal=True)
    assert "normal" not in out  # procedures.py:40 parity


def test_sharded_render_matches_single_device():
    """mesh-sharded full-frame render == single-device render, bit-identical
    (noise is pre-drawn per pixel, so device partitioning cannot change it)."""
    import jax

    from nerf_tpu.parallel import make_mesh

    cfg = PipelineConfig(model="vanilla", ray_batch=64, n_coarse=8, n_fine=16,
                         nerf_width=16, prop_width=16)
    params = init_variables(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(n_data=4, n_replica=2)
    key = jax.random.PRNGKey(3)
    pose = np.eye(4, dtype=np.float32)[:3]
    pose[2, 3] = 4.0
    single = render_image(params, pose, (20, 24), (20.0, 20.0), cfg,
                          sample_num=16, render_depth=True, key=key, chunk=64)
    sharded = render_image(params, pose, (20, 24), (20.0, 20.0), cfg,
                           sample_num=16, render_depth=True, key=key,
                           chunk=64, mesh=mesh)
    np.testing.assert_array_equal(sharded["rgb"], single["rgb"])
    np.testing.assert_array_equal(sharded["depth"], single["depth"])


def test_sharded_render_matches_single_device_divergent_padding():
    """20x20 with chunk=64 on 8 devices: single pads 400 -> 448 while sharded
    pads 400 -> 512.  Noise is drawn at the UNPADDED pixel count and padded
    after (renderer.py:_pad_noise), so the draws are identical by
    construction — not via jax_threefry_partitionable prefix-invariance
    (advisor r2 #1).  The residual tolerance is compilation-level: the
    7-chunk and 8-chunk programs fuse/reassociate a float op differently
    (measured max 3e-8); bit-identicality holds when the chunk grids match
    (test above)."""
    from nerf_tpu.parallel import make_mesh

    cfg = PipelineConfig(model="vanilla", ray_batch=64, n_coarse=8, n_fine=16,
                         nerf_width=16, prop_width=16)
    params = init_variables(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(n_data=8, n_replica=1)
    key = jax.random.PRNGKey(7)
    pose = np.eye(4, dtype=np.float32)[:3]
    pose[2, 3] = 4.0
    single = render_image(params, pose, (20, 20), (20.0, 20.0), cfg,
                          sample_num=16, key=key, chunk=64)
    sharded = render_image(params, pose, (20, 20), (20.0, 20.0), cfg,
                           sample_num=16, key=key, chunk=64, mesh=mesh)
    np.testing.assert_allclose(sharded["rgb"], single["rgb"], atol=1e-6)


def test_eval_use_pallas_override_matches_xla():
    """cfg.eval_use_pallas=True routes eval through the fused kernels
    (tools/eval_ab.py's A/B axis); the frame must match the XLA eval path."""
    cfg = PipelineConfig(n_coarse=8, n_fine=16, nerf_width=32, prop_width=32,
                         white_bkg=True, use_bf16=False, pallas_tile=64)
    params = init_variables(cfg, jax.random.PRNGKey(0))
    pose = rays_lib.pose_spherical(30.0, -30.0, 4.0)
    focal = rays_lib.fov_to_focal(0.69, (16, 16))
    out_xla = render_image(params, pose, (16, 16), focal, cfg, chunk=128)
    out_k = render_image(params, pose, (16, 16), focal,
                         cfg.replace(eval_use_pallas=True,
                                     store_residuals=False), chunk=128)
    np.testing.assert_allclose(out_k["rgb"], out_xla["rgb"],
                               rtol=1e-4, atol=1e-5)


def test_ref_eval_default_pin_routes_to_kernels_and_matches_xla():
    """Round-5 eval pin: when use_pallas resolves True, REF eval defaults to
    the forward-only fused kernels (store_residuals forced off in
    render_rays_eval — measured 15% faster than the XLA eval on v5e,
    tools/eval_ab).  The kernel frame, including the predicted-normal and
    depth extras, must match the XLA eval frame."""
    cfg = PipelineConfig(model="ref", n_coarse=8, n_fine=16, nerf_width=32,
                         prop_width=32, white_bkg=True, use_bf16=False,
                         pallas_tile=64)
    params = init_variables(cfg, jax.random.PRNGKey(0))
    pose = rays_lib.pose_spherical(30.0, -30.0, 4.0)
    focal = rays_lib.fov_to_focal(0.69, (16, 16))
    out_xla = render_image(params, pose, (16, 16), focal,
                           cfg.replace(eval_use_pallas=False), chunk=128,
                           render_depth=True, render_normal=True)
    # the DEFAULT pin (eval_use_pallas=None): ref + use_pallas True routes
    # through the kernels even though store_residuals is left at its
    # training default
    out_k = render_image(params, pose, (16, 16), focal,
                         cfg.replace(use_pallas=True), chunk=128,
                         render_depth=True, render_normal=True)
    for k in ("rgb", "depth", "normal"):
        np.testing.assert_allclose(out_k[k], out_xla[k],
                                   rtol=1e-4, atol=1e-5, err_msg=k)
