"""The live IPE mode (Mip-NeRF path the reference keeps dormant)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.core.encoding import ipe_feature
from nerf_tpu.train.config import PipelineConfig
from nerf_tpu.train.pipeline import init_variables, make_models, render_rays_train
from nerf_tpu.train.step import compute_loss


def _cfg(**kw):
    base = dict(model="vanilla", ray_batch=8, n_coarse=8, n_fine=16,
                nerf_width=16, prop_width=16, use_ipe=True, ipe_radius=0.002)
    base.update(kw)
    return PipelineConfig(**base)


def _rays(n=8):
    d = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.concatenate([jnp.zeros((n, 3)), d], axis=-1)


class TestIPEMode:
    def test_attenuation_grows_with_radius(self):
        """Wider cones -> stronger high-frequency attenuation (the point of IPE)."""
        z = jnp.linspace(2.0, 6.0, 17)[None].repeat(4, 0)
        feats = []
        for r in (1e-4, 0.1):
            f, _, _ = ipe_feature(z, _rays(4), levels=10, r=r)
            feats.append(np.abs(np.asarray(f)))
        # highest-frequency half of the feature shrinks with radius
        hi_small, hi_big = feats[0][..., -6:], feats[1][..., -6:]
        assert hi_big.mean() < 0.25 * hi_small.mean()

    def test_train_forward_and_grads_finite(self):
        cfg = _cfg()
        models = make_models(cfg)
        params = init_variables(cfg, jax.random.PRNGKey(0))
        rgb_gt = jax.random.uniform(jax.random.PRNGKey(2), (8, 3))

        (loss, metrics), grads = jax.value_and_grad(
            lambda p: compute_loss(models, p, _rays(), rgb_gt,
                                   jax.random.PRNGKey(3), cfg),
            has_aux=True)(params)
        assert np.isfinite(float(loss))
        for leaf in jax.tree.leaves(grads):
            assert np.all(np.isfinite(np.asarray(leaf)))

    def test_ipe_differs_from_pe(self):
        cfg_ipe = _cfg()
        cfg_pe = cfg_ipe.replace(use_ipe=False)
        models = make_models(cfg_pe)
        params = init_variables(cfg_pe, jax.random.PRNGKey(0))
        k = jax.random.PRNGKey(4)
        out_pe = render_rays_train(models, params, _rays(), k, cfg_pe)
        out_ipe = render_rays_train(models, params, _rays(), k, cfg_ipe)
        assert not np.allclose(out_pe["fine_rgb"], out_ipe["fine_rgb"])

    def test_ipe_converges_on_synthetic_scene(self):
        """IPE mode must actually train, not just run."""
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
            f"IPE mode failed to train: {psnr0} -> {float(m['psnr'][-1])}")
