"""End-to-end train-step tests: loss decreases, ref path differentiates,
regularizer flags work, PRNG determinism."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_tpu.core import rays as rays_lib
from nerf_tpu.data.synthetic import make_synthetic_scene
from nerf_tpu.train import losses, schedule
from nerf_tpu.train.config import PipelineConfig
from nerf_tpu.train.pipeline import init_variables, make_models, render_rays_train
from nerf_tpu.train.step import (
    compute_loss,
    create_train_state,
    make_epoch_step,
    make_optimizer,
    make_train_step,
    sample_train_rays,
)

TINY = PipelineConfig(n_coarse=24, n_fine=24, ray_batch=128,
                      nerf_width=64, prop_width=64, white_bkg=True)


@pytest.fixture(scope="module")
def tiny_scene():
    train, test, _ = make_synthetic_scene(n_train=6, n_test=1, hw=(40, 40),
                                          seed=3, n_samples=96)
    return train, test


def _setup(cfg, lr=5e-3):
    models = make_models(cfg)
    params = init_variables(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg, schedule.decay_schedule(lr, warmup_step=0))
    return models, params, tx


def test_sample_train_rays_shapes_and_gt(tiny_scene):
    train, _ = tiny_scene
    pool = jnp.asarray(train.pixel_pool())
    poses = jnp.asarray(train.poses)
    rays, rgb = sample_train_rays(
        jax.random.PRNGKey(0), pool, poses, 2, train.image_hw,
        train.focal(), 64,
    )
    assert rays.shape == (64, 6)
    assert rgb.shape == (64, 3)
    # gt pixels must come from image 2's pixel set
    img2 = train.pixel_pool()[2]
    for px in np.asarray(rgb)[:5]:
        assert np.any(np.all(np.isclose(img2, px, atol=1e-6), axis=-1))


def test_sample_train_rays_crop_window(tiny_scene):
    train, _ = tiny_scene
    pool = jnp.asarray(train.pixel_pool())
    poses = jnp.asarray(train.poses)
    h, w = train.image_hw
    window = rays_lib.crop_bounds(h, w, (0.5, 0.5))
    rays, _ = sample_train_rays(
        jax.random.PRNGKey(1), pool, poses, 0, (h, w), train.focal(), 256, window
    )
    # cropped rays have a narrower angular spread than full-image rays
    rays_full, _ = sample_train_rays(
        jax.random.PRNGKey(1), pool, poses, 0, (h, w), train.focal(), 256
    )
    d_c = np.asarray(rays[:, 3:])
    d_f = np.asarray(rays_full[:, 3:])
    assert np.ptp(d_c[:, 0]) < np.ptp(d_f[:, 0])


def test_vanilla_training_reduces_loss(tiny_scene):
    train, _ = tiny_scene
    cfg = TINY
    models, params, tx = _setup(cfg)
    state = create_train_state(params, tx)
    step = make_train_step(models, tx, cfg, train.image_hw, train.focal(),
                           donate=False)
    pool = jnp.asarray(train.pixel_pool())
    poses = jnp.asarray(train.poses)

    first_losses, last_losses = [], []
    n_steps = 120
    for i in range(n_steps):
        state, metrics = step(state, pool, poses, i % len(train))
        if i < 10:
            first_losses.append(float(metrics["img_loss"]))
        if i >= n_steps - 10:
            last_losses.append(float(metrics["img_loss"]))
    assert np.mean(last_losses) < 0.5 * np.mean(first_losses), (
        f"loss did not drop: {np.mean(first_losses)} -> {np.mean(last_losses)}"
    )
    assert np.isfinite(float(metrics["psnr"]))


def test_epoch_scan_matches_step_loop(tiny_scene):
    """One lax.scan epoch == the same steps issued one by one."""
    train, _ = tiny_scene
    cfg = TINY
    models, params, tx = _setup(cfg)
    pool = jnp.asarray(train.pixel_pool())
    poses = jnp.asarray(train.poses)
    order = jnp.arange(len(train), dtype=jnp.int32)

    key = jax.random.PRNGKey(42)
    s1 = create_train_state(params, tx)
    step = make_train_step(models, tx, cfg, train.image_hw, train.focal(),
                           base_key=key, donate=False)
    for i in np.asarray(order):
        s1, _ = step(s1, pool, poses, int(i))

    s2 = create_train_state(params, tx)
    epoch = make_epoch_step(models, tx, cfg, train.image_hw, train.focal(),
                            base_key=key)
    s2, _ = epoch(s2, pool, poses, order)

    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_ref_model_loss_and_grads_finite(tiny_scene):
    train, _ = tiny_scene
    cfg = TINY.replace(model="ref", prop_normal=True, ray_batch=32,
                       n_coarse=16, n_fine=16)
    models, params, tx = _setup(cfg)
    pool = jnp.asarray(train.pixel_pool())
    poses = jnp.asarray(train.poses)
    rays, rgb_gt = sample_train_rays(
        jax.random.PRNGKey(0), pool, poses, 0, train.image_hw, train.focal(),
        cfg.ray_batch,
    )
    (loss, metrics), grads = jax.value_and_grad(
        lambda p: compute_loss(models, p, rays, rgb_gt, jax.random.PRNGKey(1), cfg),
        has_aux=True,
    )(params)
    assert np.isfinite(float(loss))
    assert "normal_loss" in metrics and "bf_loss" in metrics
    for g in jax.tree.leaves(grads):
        assert np.all(np.isfinite(np.asarray(g)))
    # normal losses must contribute gradient to the normal head
    g_norm = grads["nerf"]["norm_col_tint_head"]["kernel"]
    assert float(jnp.abs(g_norm).max()) > 0


def test_legacy_coarse_positions_match_reference_selector():
    """legacy_coarse_positions == the reference's boolean-selector semantics.

    Oracle: replicate coarse_grad_select (ref_model.py:108-117) in numpy on
    the sort-based merge — selector over the TRUNCATED length marks pre-sort
    indices [n_kept - C, n_kept), gathered through sort_inds, then boolean-
    indexed in merged order."""
    from nerf_tpu.core import sampling
    from nerf_tpu.train.step import legacy_coarse_positions

    rng = np.random.default_rng(7)
    r, nc, nf = 16, 24, 33  # nf = n_fine + 1 of the pipeline
    c_z = np.sort(rng.uniform(2.0, 6.0, (r, nc)).astype(np.float32), axis=-1)
    # fine samples strictly inside the coarse midpoint range, like
    # inverse_sample's bins (guarantees the dropped max is the last coarse)
    lo = 0.5 * (c_z[:, :1] + c_z[:, 1:2])
    hi = 0.5 * (c_z[:, -2:-1] + c_z[:, -1:])
    f_z = np.sort(lo + (hi - lo) * rng.random((r, nf)).astype(np.float32),
                  axis=-1)

    _, _, coarse_pos = sampling.merge_coarse_fine(
        jnp.asarray(c_z), jnp.asarray(f_z))
    last_fine_pos = (nf - 1) + np.sum(c_z[:, None, :] < f_z[:, -1:, None],
                                      axis=-1)[:, 0]
    q = np.asarray(legacy_coarse_positions(coarse_pos,
                                           jnp.asarray(last_fine_pos)))

    # ---- numpy oracle of the reference semantics ----
    z_cat = np.concatenate([f_z, c_z], axis=-1)         # (r, n)
    order = np.argsort(z_cat, axis=-1, kind="stable")   # sort_inds
    n_kept = nc + nf - 1
    sort_ids = order[:, :n_kept]
    selector_pre = np.zeros(nc + nf, bool)
    selector_pre[n_kept - nc:n_kept] = True             # the off-by-one
    expected = np.stack([np.nonzero(selector_pre[sort_ids[i]])[0]
                         for i in range(r)])
    assert expected.shape == (r, nc)
    np.testing.assert_array_equal(q, expected)


def test_legacy_coarse_select_changes_loss(tiny_scene):
    train, _ = tiny_scene
    cfg = TINY.replace(model="ref", prop_normal=True, ray_batch=32,
                       n_coarse=16, n_fine=16)
    models, params, _ = _setup(cfg)
    pool = jnp.asarray(train.pixel_pool())
    poses = jnp.asarray(train.poses)
    rays, rgb_gt = sample_train_rays(
        jax.random.PRNGKey(0), pool, poses, 0, train.image_hw, train.focal(),
        cfg.ray_batch,
    )
    key = jax.random.PRNGKey(1)
    l0, _ = compute_loss(models, params, rays, rgb_gt, key, cfg)
    l1, m1 = compute_loss(models, params, rays, rgb_gt, key,
                          cfg.replace(legacy_coarse_select=True))
    assert np.isfinite(float(l1))
    # documented divergence: the quirk trains a (slightly) different objective
    assert float(l0) != float(l1)


def test_regularizer_flags_change_loss(tiny_scene):
    train, _ = tiny_scene
    base = TINY.replace(ray_batch=32)
    models, params, _ = _setup(base)
    pool = jnp.asarray(train.pixel_pool())
    poses = jnp.asarray(train.poses)
    rays, rgb_gt = sample_train_rays(
        jax.random.PRNGKey(0), pool, poses, 0, train.image_hw, train.focal(), 32
    )
    key = jax.random.PRNGKey(1)
    l0, _ = compute_loss(models, params, rays, rgb_gt, key, base)
    l_ent, _ = compute_loss(models, params, rays, rgb_gt, key,
                            base.replace(entropy_w=0.1))
    l_dist, _ = compute_loss(models, params, rays, rgb_gt, key,
                             base.replace(distortion_w=0.1))
    assert float(l_ent) != float(l0)
    assert float(l_dist) != float(l0)


def test_train_step_deterministic(tiny_scene):
    train, _ = tiny_scene
    cfg = TINY.replace(ray_batch=32)
    models, params, tx = _setup(cfg)
    pool = jnp.asarray(train.pixel_pool())
    poses = jnp.asarray(train.poses)
    step = make_train_step(models, tx, cfg, train.image_hw, train.focal(),
                           base_key=jax.random.PRNGKey(9), donate=False)
    sA, mA = step(create_train_state(params, tx), pool, poses, 1)
    sB, mB = step(create_train_state(params, tx), pool, poses, 1)
    assert float(mA["loss"]) == float(mB["loss"])


def test_decay_schedule_parity():
    """Schedule values match the reference DecayLrScheduler formula."""
    sch = schedule.decay_schedule(1e-3, min_ratio=0.01, decay_rate=0.1,
                                  decay_step=1000, warmup_step=100)
    # warmup at step 50: lr * (0.01 * 0.5 + 0.5)
    np.testing.assert_allclose(float(sch(50)), 1e-3 * (0.01 * 0.5 + 0.5), rtol=1e-5)
    # decay at step 1100: lr * 0.1^(1000/1000)
    np.testing.assert_allclose(float(sch(1100)), 1e-4, rtol=1e-4)
    # floor
    np.testing.assert_allclose(float(sch(10**7)), 1e-5, rtol=1e-4)
    # actual_lr scaling (train.py:56)
    assert schedule.scaled_base_lr(1.5e-4, 1024) == 1.5e-4 * 2.0


def test_proposal_loss_golden():
    bounds = jnp.asarray([[0.5, 0.2]])
    w = jnp.asarray([[0.7, 0.1]])
    got = float(losses.proposal_loss(bounds, w))
    want = (0.2**2) / (0.7 + 1e-8)  # second term clamps to 0
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_ray_entropy_masks_empty_rays():
    w = jnp.asarray([
        [0.5, 0.5, 0.0, 0.0],   # opaque ray: entropy log(2)
        [0.001, 0.001, 0.0, 0.0],  # background ray: masked
    ])
    got = float(losses.ray_entropy_loss(w, acc_threshold=0.1))
    np.testing.assert_allclose(got, np.log(2), rtol=1e-3)


def test_weighted_normal_loss_golden():
    """Hand-computed: w*(1 - d.n) averaged (ref_model.py:127-135)."""
    w = jnp.asarray([[0.5, 2.0]])
    d = jnp.asarray([[[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]]])
    p = jnp.asarray([[[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]]])
    # per-sample: 0.5*(1-1)=0, 2.0*(1-0)=2 -> mean 1.0, sum 2.0
    np.testing.assert_allclose(
        float(losses.weighted_normal_loss(w, d, p, size_average=True)), 1.0,
        atol=1e-6)
    np.testing.assert_allclose(
        float(losses.weighted_normal_loss(w, d, p, size_average=False)), 2.0,
        atol=1e-6)


def test_backface_loss_golden():
    """Hand-computed: mean(w * relu(n.d)) (ref_model.py:137-143)."""
    w = jnp.asarray([[1.0, 3.0]])
    n = jnp.asarray([[[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]]])
    d = jnp.asarray([[[0.0, 0.0, 2.0], [0.0, 0.0, -5.0]]])
    # relu(n.d): [2, 0] -> w*: [2, 0] -> mean 1.0
    np.testing.assert_allclose(float(losses.backface_loss(w, n, d)), 1.0,
                               atol=1e-6)


def test_rowland_normal_losses_match_plain():
    """The ROW-LAND (3, R, P) loss variants (the layout the TPU-default ref
    pipeline emits) compute the same values as the (R, P, 3) originals."""
    rng = np.random.default_rng(9)
    r, p = 5, 7
    w = jnp.asarray(rng.uniform(size=(r, p)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(r, p, 3)).astype(np.float32))
    n = jnp.asarray(rng.normal(size=(r, p, 3)).astype(np.float32))
    ray_d = jnp.asarray(rng.normal(size=(r, 3)).astype(np.float32))
    d3 = jnp.moveaxis(d, -1, 0)
    n3 = jnp.moveaxis(n, -1, 0)
    for avg in (True, False):
        np.testing.assert_allclose(
            float(losses.weighted_normal_loss_rl(w, d3, n3, size_average=avg)),
            float(losses.weighted_normal_loss(w, d, n, size_average=avg)),
            rtol=1e-6)
    # plain backface takes the per-sample broadcast dirs; _rl takes per-ray
    dirs_full = jnp.broadcast_to(ray_d[:, None, :], (r, p, 3))
    np.testing.assert_allclose(
        float(losses.backface_loss_rl(w, n3, ray_d)),
        float(losses.backface_loss(w, n, dirs_full)), rtol=1e-6)
