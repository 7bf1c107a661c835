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


def test_mixed_backward_strategy_matches_xla():
    """prop_store_residuals=False + store_residuals=True (the roofline-
    suggested mixed strategy: recompute-form prop backward, residual-form
    fine backward) must still reproduce the XLA oracle's gradients."""
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
    loss_mixed, grads_mixed = loss_for(
        base.replace(use_pallas=True, store_residuals=True,
                     prop_store_residuals=False))

    np.testing.assert_allclose(loss_mixed, loss_ref, rtol=1e-5)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(grads_ref),
        jax.tree_util.tree_leaves_with_path(grads_mixed),
    ):
        np.testing.assert_allclose(
            b, a, rtol=5e-4, atol=1e-6, err_msg=jax.tree_util.keystr(kp))


def _ref_loss_and_grads(cfg, params, models, rays, rgb_gt, k):
    def f(p):
        return compute_loss(models, p, rays, rgb_gt, k, cfg)
    (loss, _), grads = jax.value_and_grad(f, has_aux=True)(params)
    return loss, grads


def test_ref_allkernel_pipeline_matches_xla():
    """cfg.ref_kernels="all" (whole fine forward in the two ops/ref_fused.py
    kernels) must reproduce the XLA ref path through compute_loss: same loss,
    same grads.  bottleneck_noise=0 — the flax path draws noise at (R, P, 128)
    and the kernel path at (R*P, 128), so nonzero noise differs by
    construction (same distribution)."""
    base = PipelineConfig(model="ref", ray_batch=8, n_coarse=8, n_fine=8,
                          nerf_width=32, prop_width=32, use_bf16=False,
                          pallas_tile=64, bottleneck_noise=0.0)
    key = jax.random.PRNGKey(0)
    models = make_models(base)
    params = init_variables(base, key)
    rays = jnp.concatenate(
        [jnp.zeros((8, 3)), jax.random.normal(jax.random.PRNGKey(1), (8, 3))],
        axis=-1)
    rgb_gt = jax.random.uniform(jax.random.PRNGKey(2), (8, 3))
    k = jax.random.PRNGKey(3)

    loss_ref, grads_ref = _ref_loss_and_grads(base, params, models, rays,
                                              rgb_gt, k)
    for mode in ("hybrid", "all"):
        cfg = base.replace(use_pallas=True, ref_kernels=mode)
        loss_f, grads_f = _ref_loss_and_grads(cfg, params, models, rays,
                                              rgb_gt, k)
        np.testing.assert_allclose(loss_f, loss_ref, rtol=1e-5,
                                   err_msg=mode)
        for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(grads_ref),
            jax.tree_util.tree_leaves_with_path(grads_f),
        ):
            np.testing.assert_allclose(
                b, a, rtol=5e-4, atol=2e-6,
                err_msg=f"{mode}:{jax.tree_util.keystr(kp)}")


def test_ref_kernel_noise_rbg_deterministic():
    """The all-kernel path's bottleneck noise is drawn with the rbg PRNG
    (pipeline.py:_ref_fine_forward_allkernel — RngBitGenerator is the
    TPU-native generator; threefry cost ~0.6 ms/step).  Pin the contract:
    deterministic in the step key, varying across keys, and ~N(0, noise_std)
    at the distribution level."""
    cfg = PipelineConfig(model="ref", ray_batch=8, n_coarse=8, n_fine=8,
                         nerf_width=32, prop_width=32, use_bf16=False,
                         pallas_tile=64, bottleneck_noise=0.02,
                         use_pallas=True, ref_kernels="all")
    models = make_models(cfg)
    params = init_variables(cfg, jax.random.PRNGKey(0))
    rays = jnp.concatenate(
        [jnp.zeros((8, 3)), jax.random.normal(jax.random.PRNGKey(1), (8, 3))],
        axis=-1)
    rgb_gt = jax.random.uniform(jax.random.PRNGKey(2), (8, 3))

    def loss(k):
        return compute_loss(models, params, rays, rgb_gt, k, cfg)[0]

    l0a, l0b = loss(jax.random.PRNGKey(3)), loss(jax.random.PRNGKey(3))
    l1 = loss(jax.random.PRNGKey(4))
    np.testing.assert_array_equal(l0a, l0b)
    assert not np.allclose(l0a, l1), "noise must vary with the step key"

    from nerf_tpu.train.pipeline import _rbg_noise_key
    k = jax.random.PRNGKey(5)
    noise = jax.random.normal(_rbg_noise_key(k), (4096, 128))
    assert abs(float(noise.mean())) < 0.05
    assert abs(float(noise.std()) - 1.0) < 0.05


def test_pe_doubling_pipeline_matches_xla():
    """pe_doubling=True (row-land angle-doubling spatial PE) must reproduce
    the XLA oracle's loss/grads to the PE error bound (~6e-5 on enc,
    fastmath.positional_encoding_dbl) — checked in f32 so the doubling error
    itself (not bf16 quantization) sets the tolerance."""
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
    loss_dbl, grads_dbl = loss_for(
        base.replace(use_pallas=True, pe_doubling=True))

    np.testing.assert_allclose(loss_dbl, loss_ref, rtol=1e-4)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(grads_ref),
        jax.tree_util.tree_leaves_with_path(grads_dbl),
    ):
        np.testing.assert_allclose(
            b, a, rtol=5e-3, atol=5e-5, err_msg=jax.tree_util.keystr(kp))
