"""True Mip-NeRF mode (-m): one network, two IPE passes, self-resampling."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.train.config import PipelineConfig
from nerf_tpu.train.pipeline import init_variables, make_models, render_rays_train
from nerf_tpu.train.renderer import render_image
from nerf_tpu.train.step import compute_loss


def _cfg(**kw):
    base = dict(model="mip", ray_batch=16, n_coarse=8, n_fine=16,
                nerf_width=16, ipe_radius=0.002)
    base.update(kw)
    return PipelineConfig(**base)


def _rays(n=16):
    d = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.concatenate([jnp.zeros((n, 3)), d], axis=-1)


class TestMipModel:
    def test_single_network_no_prop(self):
        cfg = _cfg()
        nerf, prop = make_models(cfg)
        assert prop is None
        params = init_variables(cfg, jax.random.PRNGKey(0))
        assert set(params) == {"nerf"}  # truly one network

    def test_train_forward_and_grads(self):
        cfg = _cfg()
        models = make_models(cfg)
        params = init_variables(cfg, jax.random.PRNGKey(0))
        out = render_rays_train(models, params, _rays(), jax.random.PRNGKey(2), cfg)
        assert out["fine_rgb"].shape == (16, 3)
        assert out["coarse_rgb"].shape == (16, 3)
        assert out["weights"].shape == (16, cfg.n_fine)

        rgb_gt = jax.random.uniform(jax.random.PRNGKey(3), (16, 3))
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: compute_loss(models, p, _rays(), rgb_gt,
                                   jax.random.PRNGKey(4), cfg),
            has_aux=True)(params)
        assert np.isfinite(float(loss)) and "coarse_loss" in metrics
        for leaf in jax.tree.leaves(grads):
            assert np.all(np.isfinite(np.asarray(leaf)))

    def test_train_pipeline_fused_matches_xla(self):
        """Mip through the fused vanilla kernel (IPE features as enc_x) vs
        the flax/XLA oracle: whole-train-loss values AND parameter grads.
        Valid because the IPE features are functions of detached edges —
        the kernel's zero input cotangents are exact (pipeline.py contract;
        the resampling weights are stop_gradient'ed like the reference's
        utils.py:35-36 detach)."""
        cfg_x = _cfg(use_pallas=False, pallas_tile=64)
        cfg_f = _cfg(use_pallas=True, pallas_tile=64)
        models_x, models_f = make_models(cfg_x), make_models(cfg_f)
        params = init_variables(cfg_x, jax.random.PRNGKey(0))
        rgb_gt = jax.random.uniform(jax.random.PRNGKey(3), (16, 3))
        key = jax.random.PRNGKey(4)

        (lx, _), gx = jax.value_and_grad(
            lambda p: compute_loss(models_x, p, _rays(), rgb_gt, key, cfg_x),
            has_aux=True)(params)
        (lf, _), gf = jax.value_and_grad(
            lambda p: compute_loss(models_f, p, _rays(), rgb_gt, key, cfg_f),
            has_aux=True)(params)
        np.testing.assert_allclose(float(lf), float(lx), rtol=1e-4)
        fx, _ = jax.flatten_util.ravel_pytree(gx)
        ff, _ = jax.flatten_util.ravel_pytree(gf)
        np.testing.assert_allclose(np.asarray(ff), np.asarray(fx),
                                   rtol=5e-3, atol=2e-4)

    def test_eval_render(self):
        cfg = _cfg()
        params = init_variables(cfg, jax.random.PRNGKey(0))
        pose = np.eye(4, dtype=np.float32)[:3]
        pose[2, 3] = 4.0
        out = render_image(params, pose, (8, 8), (11.0, 11.0), cfg, chunk=64,
                           render_depth=True)
        assert out["rgb"].shape == (8, 8, 3) and out["depth"].shape == (8, 8)
        assert np.all(np.isfinite(out["rgb"]))

    def test_converges_on_synthetic_scene(self):
        from nerf_tpu.data.synthetic import make_synthetic_scene
        from nerf_tpu.train import schedule
        from nerf_tpu.train.step import (
            create_train_state, make_epoch_step, make_optimizer,
        )

        train, _, _ = make_synthetic_scene(n_train=6, n_test=1, hw=(24, 24),
                                           seed=0, n_samples=32)
        cfg = _cfg(ray_batch=64, white_bkg=True)
        models = make_models(cfg)
        params = init_variables(cfg, jax.random.PRNGKey(0))
        tx = make_optimizer(cfg, schedule.decay_schedule(5e-3, warmup_step=0))
        state = create_train_state(params, tx)
        epoch = make_epoch_step(models, tx, cfg, train.image_hw, train.focal())
        pool = jnp.asarray(train.pixel_pool())
        poses = jnp.asarray(train.poses)
        order = jnp.arange(6, dtype=jnp.int32)
        psnr0 = None
        for _ in range(20):
            state, m = epoch(state, pool, poses, order)
            if psnr0 is None:
                psnr0 = float(m["psnr"][0])
        assert float(m["psnr"][-1]) > psnr0 + 2.0, (
            f"mip mode failed to train: {psnr0} -> {float(m['psnr'][-1])}")

    def test_cli_flag_maps_to_mip(self):
        from nerf_tpu.cli import get_parser
        from nerf_tpu.cli.flags import config_from_args

        args = get_parser().parse_args(["-m"])
        cfg = config_from_args(args)
        assert cfg.model == "mip" and cfg.use_ipe

    def test_mip_and_ref_exclusive(self):
        import pytest

        from nerf_tpu.cli import get_parser
        from nerf_tpu.cli.flags import config_from_args

        args = get_parser().parse_args(["-m", "-t"])
        with pytest.raises(SystemExit):
            config_from_args(args)
