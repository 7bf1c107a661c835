"""View-dependent (specular) oracle scene: the shiny-blender analogue.

Validates that the generator really produces view-dependent radiance and
that the direction-conditioned models can fit it end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.data.synthetic import _scene_params, field_fn, make_synthetic_scene
from nerf_tpu.train import schedule
from nerf_tpu.train.config import PipelineConfig
from nerf_tpu.train.pipeline import init_variables, make_models
from nerf_tpu.train.step import create_train_state, make_epoch_step, make_optimizer


class TestSpecularField:
    def test_radiance_is_view_dependent(self):
        scene = _scene_params(0, specular=0.5)
        f = field_fn(scene)
        pts = jnp.asarray(np.random.default_rng(0).normal(size=(10, 3)) * 0.3,
                          jnp.float32)
        d1 = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), pts.shape)
        d2 = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), pts.shape)
        _, rgb1 = f(pts, d1)
        _, rgb2 = f(pts, d2)
        assert not np.allclose(np.asarray(rgb1), np.asarray(rgb2))
        # density itself must stay view-independent
        s1, _ = f(pts, d1)
        s2, _ = f(pts, d2)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2))

    def test_specular_zero_matches_diffuse(self):
        diff = field_fn(_scene_params(0, specular=0.0))
        spec = field_fn(_scene_params(0, specular=0.5))
        pts = jnp.ones((4, 3)) * 0.2
        _, rgb_d = diff(pts, jnp.ones((4, 3)))
        _, rgb_s0 = spec(pts, None)  # no dirs -> diffuse fallback
        np.testing.assert_allclose(np.asarray(rgb_d), np.asarray(rgb_s0))


class TestSpecularTraining:
    def test_vanilla_fits_view_dependence(self):
        train, _, _ = make_synthetic_scene(n_train=6, n_test=1, hw=(24, 24),
                                           seed=0, n_samples=32, specular=0.6)
        cfg = PipelineConfig(ray_batch=64, n_coarse=8, n_fine=16,
                             nerf_width=16, prop_width=16, white_bkg=True)
        models = make_models(cfg)
        params = init_variables(cfg, jax.random.PRNGKey(0))
        tx = make_optimizer(cfg, schedule.decay_schedule(5e-3, warmup_step=0))
        state = create_train_state(params, tx)
        epoch = make_epoch_step(models, tx, cfg, train.image_hw, train.focal())
        pool, poses = jnp.asarray(train.pixel_pool()), jnp.asarray(train.poses)
        order = jnp.arange(6, dtype=jnp.int32)
        psnr0 = None
        for _ in range(20):
            state, m = epoch(state, pool, poses, order)
            if psnr0 is None:
                psnr0 = float(m["psnr"][0])
        assert float(m["psnr"][-1]) > psnr0 + 2.0
