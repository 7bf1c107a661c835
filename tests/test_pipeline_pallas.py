"""End-to-end equivalence of the fused-Pallas pipeline vs the XLA oracle:
same loss, same parameter gradients, through render_rays_train + compute_loss.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.train.config import PipelineConfig
from nerf_tpu.train.pipeline import init_variables, make_models
from nerf_tpu.train.step import compute_loss


def test_fused_pipeline_matches_xla():
    base = PipelineConfig(model="vanilla", ray_batch=16, n_coarse=8, n_fine=16,
                          nerf_width=32, prop_width=32, use_bf16=False,
                          pallas_tile=64)
    key = jax.random.PRNGKey(0)
    models = make_models(base)
    params = init_variables(base, key)
    rays = jnp.concatenate(
        [jnp.zeros((16, 3)), jax.random.normal(jax.random.PRNGKey(1), (16, 3))],
        axis=-1)
    rgb_gt = jax.random.uniform(jax.random.PRNGKey(2), (16, 3))
    k = jax.random.PRNGKey(3)

    def loss_for(cfg):
        def f(p):
            return compute_loss(models, p, rays, rgb_gt, k, cfg)
        (loss, metrics), grads = jax.value_and_grad(f, has_aux=True)(params)
        return loss, grads

    loss_ref, grads_ref = loss_for(base)
    loss_fused, grads_fused = loss_for(base.replace(use_pallas=True))

    np.testing.assert_allclose(loss_fused, loss_ref, rtol=1e-5)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(grads_ref),
        jax.tree_util.tree_leaves_with_path(grads_fused),
    ):
        np.testing.assert_allclose(
            b, a, rtol=5e-4, atol=1e-6, err_msg=jax.tree_util.keystr(kp))
