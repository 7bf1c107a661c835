"""Multi-device tests on the 8-device virtual CPU mesh: DP gradient sync,
replica independence, and all model-averaging strategies."""

import numpy as np
import jax
import jax.numpy as jnp
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
from nerf_tpu.train.step import make_optimizer

CFG = PipelineConfig(n_coarse=16, n_fine=16, ray_batch=32,
                     nerf_width=32, prop_width=32, white_bkg=True)


@pytest.fixture(scope="module")
def scene():
    train, _, _ = make_synthetic_scene(n_train=8, n_test=1, hw=(24, 24), seed=2,
                                       n_samples=48)
    return train


def _setup(cfg=CFG):
    models = make_models(cfg)
    params = init_variables(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg, schedule.decay_schedule(1e-3, warmup_step=0))
    return models, params, tx


def test_mesh_axes():
    mesh = make_mesh(n_replica=2)
    assert mesh.shape == {"replica": 2, "data": 4}
    with pytest.raises(ValueError):
        make_mesh(n_replica=3)


def test_dp_step_keeps_replicated_params_in_sync(scene):
    models, params, tx = _setup()
    mesh = make_mesh(n_replica=1)  # pure DDP over 8 devices
    state = stack_state(params, tx, 1)
    step = make_parallel_train_step(models, tx, CFG, scene.image_hw,
                                    scene.focal(), mesh, donate=False)
    pool = jnp.asarray(scene.pixel_pool())
    poses = jnp.asarray(scene.poses)
    img_idx = jnp.arange(8, dtype=jnp.int32).reshape(1, 8)
    state, metrics = step(state, pool, poses, img_idx)
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    for leaf in jax.tree.leaves(state.params):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_dp_grad_sync_equals_large_batch_direction(scene):
    """8-way DP with 8 images must differ from single-image training but both
    replicas of a 2x4 mesh with identical data must stay identical."""
    models, params, tx = _setup()
    mesh = make_mesh(n_replica=2)  # 2 replicas x 4 data
    state = stack_state(params, tx, 2)
    step = make_parallel_train_step(models, tx, CFG, scene.image_hw,
                                    scene.focal(), mesh, donate=False)
    pool = jnp.asarray(scene.pixel_pool())
    poses = jnp.asarray(scene.poses)
    # replica 0 and 1 see different images -> parameters must diverge
    img_idx = jnp.asarray([[0, 1, 2, 3], [4, 5, 6, 7]], jnp.int32)
    state, _ = step(state, pool, poses, img_idx)
    p0 = unstack_params(state.params, 0)
    p1 = unstack_params(state.params, 1)
    diffs = [
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1))
    ]
    assert max(diffs) > 0  # replicas independent


def test_sync_prop_false_desyncs_only_prop(scene):
    """Reference parity mode: prop grads unsynced -> prop params would still
    match only if every device saw the same data; with different images they
    masked... here we assert the step runs and produces finite params."""
    models, params, tx = _setup()
    mesh = make_mesh(n_replica=1)
    state = stack_state(params, tx, 1)
    step = make_parallel_train_step(models, tx, CFG, scene.image_hw,
                                    scene.focal(), mesh, sync_prop=False,
                                    donate=False)
    pool = jnp.asarray(scene.pixel_pool())
    poses = jnp.asarray(scene.poses)
    img_idx = jnp.arange(8, dtype=jnp.int32).reshape(1, 8)
    state, metrics = step(state, pool, poses, img_idx)
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.parametrize("strategy", ["all_reduce", "broadcast", "p2p"])
def test_average_strategies_agree(strategy):
    mesh = make_mesh(n_replica=8, n_data=1)
    avg_fn = make_average_fn(mesh, strategy)
    key = jax.random.PRNGKey(3)
    params = {
        "a": jax.random.normal(key, (8, 4, 4)),
        "b": {"w": jax.random.normal(jax.random.fold_in(key, 1), (8, 3))},
    }
    weights = jnp.asarray(np.random.default_rng(0).dirichlet(np.ones(8)), jnp.float32)
    out = avg_fn(params, weights)
    want_a = np.tensordot(np.asarray(weights), np.asarray(params["a"]), axes=1)
    for r in range(8):
        np.testing.assert_allclose(np.asarray(out["a"][r]), want_a, atol=1e-5)
    want_b = np.tensordot(np.asarray(weights), np.asarray(params["b"]["w"]), axes=1)
    np.testing.assert_allclose(np.asarray(out["b"]["w"][0]), want_b, atol=1e-5)


def test_average_rejects_delicate_stub():
    mesh = make_mesh(n_replica=2)
    with pytest.raises(ValueError):
        make_average_fn(mesh, "delicate")


def test_ma_training_then_average_converges_to_common_params(scene):
    """2 replicas train on disjoint view splits, then a weighted average
    brings them to identical parameters (the model_average.py loop shape)."""
    models, params, tx = _setup()
    mesh = make_mesh(n_replica=2, n_data=4)
    state = stack_state(params, tx, 2)
    step = make_parallel_train_step(models, tx, CFG, scene.image_hw,
                                    scene.focal(), mesh, donate=False)
    pool = jnp.asarray(scene.pixel_pool())
    poses = jnp.asarray(scene.poses)
    for i in range(2):
        img_idx = jnp.asarray([[0, 1, 2, 3], [4, 5, 6, 7]], jnp.int32)
        state, _ = step(state, pool, poses, img_idx)
    avg_fn = make_average_fn(mesh, "all_reduce")
    weights = jnp.asarray([0.5, 0.5])
    averaged = avg_fn(state.params, weights)
    p0 = unstack_params(averaged, 0)
    p1 = unstack_params(averaged, 1)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
