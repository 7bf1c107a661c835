"""Fused Pallas kernels UNDER shard_map (interpret mode on the CPU mesh).

The shipped TPU multi-chip program is "fused kernels inside a
('replica','data') shard_map" — the composition the reference ships as
DDP-wrapped CUDA modules (ddp_train.py:95-99).  These tests execute exactly
that composition on the virtual device mesh: the custom-call kernels run in
interpret mode inside the sharded per-device function, with the gradient
pmean over 'data' crossing the custom-call boundary.

The oracle is the SINGLE-DEVICE kernel path (itself pinned to the XLA/flax
oracle by tests/test_pipeline_pallas.py): per-device gradients are recomputed
outside shard_map with the identical key derivation, averaged by hand, and
pushed through the same optimizer — the DP step must land on the same
parameters.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from nerf_tpu.data.synthetic import make_synthetic_scene
from nerf_tpu.parallel import (
    make_average_fn,
    make_mesh,
    make_parallel_train_step,
    stack_state,
    unstack_params,
)
from nerf_tpu.train import schedule
from nerf_tpu.train.config import PipelineConfig
from nerf_tpu.train.pipeline import init_variables, make_models
from nerf_tpu.train.step import compute_loss, make_optimizer, sample_train_rays

# f32 + tiny tile: interpret-mode kernels, exact comparisons
KCFG = PipelineConfig(n_coarse=8, n_fine=16, ray_batch=16,
                      nerf_width=32, prop_width=32, white_bkg=True,
                      use_pallas=True, pallas_tile=64, use_bf16=False)


@pytest.fixture(scope="module")
def scene():
    train, _, _ = make_synthetic_scene(n_train=8, n_test=1, hw=(24, 24),
                                       seed=2, n_samples=48)
    return train


def _setup(cfg, sgd=False):
    models = make_models(cfg)
    params = init_variables(cfg, jax.random.PRNGKey(0))
    # The grad-pin test uses plain SGD: the parameter delta is then LINEAR in
    # the pmean'ed gradients (delta = -lr * grad), so the comparison pins the
    # gradients themselves.  Adam's rsqrt normalization turns f32
    # summation-order noise on near-zero grads into full +-lr sign flips.
    tx = (optax.sgd(1e-2) if sgd else
          make_optimizer(cfg, schedule.decay_schedule(1e-3, warmup_step=0)))
    return models, params, tx


def _oracle_dp_params(models, params, tx, cfg, scene, img_ids, n_data):
    """Single-device re-derivation of one DP step: same per-device key
    chain as parallel/dp.py:per_device (fold_in(fold_in(base, step), idx)),
    kernel-path grads per device, hand pmean, one optimizer update."""
    pool = jnp.asarray(scene.pixel_pool())
    poses = jnp.asarray(scene.poses)
    grads_acc = None
    for dat, img in enumerate(img_ids):
        key = jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(0), 0), dat)
        k_pix, k_render = jax.random.split(key)
        rays, rgb_gt = sample_train_rays(
            k_pix, pool, poses, jnp.int32(img), scene.image_hw,
            scene.focal(), cfg.ray_batch, None)
        grads = jax.grad(
            lambda p: compute_loss(models, p, rays, rgb_gt, k_render,
                                   cfg)[0])(params)
        grads_acc = grads if grads_acc is None else jax.tree.map(
            jnp.add, grads_acc, grads)
    grads_mean = jax.tree.map(lambda g: g / n_data, grads_acc)
    updates, _ = tx.update(grads_mean, tx.init(params), params)
    return optax.apply_updates(params, updates)


@pytest.mark.parametrize("model,extra", [
    ("vanilla", {}),
    ("ref", {"ref_kernels": "all", "bottleneck_noise": 0.0,
             "prop_normal": True}),
])
def test_dp_kernel_step_matches_single_device_kernel_oracle(
        scene, model, extra):
    """Kernel-path DP gradients == the single-device kernel oracle.

    Protects the reference's DDP grad-sync semantics (ddp_train.py:95-99)
    composed with the custom-call kernels.  Ref runs the all-kernel path
    with prop_normal (the dryrun/flagship multi-chip config); noise=0
    because the flax/kernel paths draw different streams by construction.
    """
    cfg = KCFG.replace(model=model, **extra)
    models, params, tx = _setup(cfg, sgd=True)
    n_data = 2
    mesh = make_mesh(n_replica=1, n_data=n_data,
                     devices=jax.devices()[:n_data])
    state = stack_state(params, tx, 1)
    step = make_parallel_train_step(models, tx, cfg, scene.image_hw,
                                    scene.focal(), mesh, donate=False)
    pool = jnp.asarray(scene.pixel_pool())
    poses = jnp.asarray(scene.poses)
    img_ids = [0, 1]
    state, metrics = step(state, pool, poses,
                          jnp.asarray([img_ids], jnp.int32))
    assert np.isfinite(float(metrics["loss"]))

    want = _oracle_dp_params(models, params, tx, cfg, scene, img_ids, n_data)
    got = unstack_params(state.params, 0)
    # SGD delta = -lr * pmean(grads): comparing the deltas pins the
    # gradients themselves.  Norm-relative tolerance, not elementwise: the
    # shard_map body and the single-device oracle are DIFFERENT compiled
    # programs, and XLA's per-program rounding (~1e-7 on the prop-net
    # weights) occasionally flips a discrete inverse-CDF bin / merge rank,
    # perturbing a handful of grad elements by ~1e-4 (measured; a 1-device
    # shard_map is bit-exact vs plain jit).  Real sync bugs — wrong pmean
    # axis, missing sync, kernel corruption under sharding — are O(1)
    # relative errors and fail this loudly.
    for (kp, p0), (_, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(want),
        jax.tree_util.tree_leaves_with_path(got),
    ):
        dw = np.asarray(a) - np.asarray(p0)
        dg = np.asarray(b) - np.asarray(p0)
        err = np.linalg.norm(dg - dw)
        ref_norm = np.linalg.norm(dw)
        assert err <= 1e-2 * ref_norm + 1e-7, (
            f"{jax.tree_util.keystr(kp)}: |delta diff|={err:.3e} vs "
            f"|oracle delta|={ref_norm:.3e}")


def test_ma_kernel_step_average_converges(scene):
    """Model-averaging composition on the kernel path: 2 replicas x 2 data,
    train one kernel-path step each on disjoint views, weighted all_reduce
    average must leave both replicas on identical parameters
    (model_average.py:230-260 semantics)."""
    cfg = KCFG.replace(model="vanilla")
    models, params, tx = _setup(cfg)
    mesh = make_mesh(n_replica=2, n_data=2, devices=jax.devices()[:4])
    state = stack_state(params, tx, 2)
    step = make_parallel_train_step(models, tx, cfg, scene.image_hw,
                                    scene.focal(), mesh, donate=False)
    pool = jnp.asarray(scene.pixel_pool())
    poses = jnp.asarray(scene.poses)
    state, metrics = step(state, pool, poses,
                          jnp.asarray([[0, 1], [2, 3]], jnp.int32))
    assert np.isfinite(float(metrics["loss"]))
    avg_fn = make_average_fn(mesh, "all_reduce")
    averaged = avg_fn(state.params, jnp.asarray([0.25, 0.75]))
    p0, p1 = unstack_params(averaged, 0), unstack_params(averaged, 1)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        assert np.all(np.isfinite(np.asarray(a)))
