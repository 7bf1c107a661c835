"""Tests for the ops shell: checkpointing, timer, metrics, images, debug."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_tpu.utils import (
    CheckpointManager, MetricsWriter, Timer, check_finite, load_checkpoint,
    nan_debug, save_checkpoint, save_image_grid, to_uint8,
)


def _tree(seed=0):
    k = jax.random.PRNGKey(seed)
    return {
        "nerf": {"w": jax.random.normal(k, (4, 8)), "b": jnp.zeros((8,))},
        "prop": {"w": jnp.ones((3, 3)) * seed},
    }


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        tree = _tree(3)
        p = save_checkpoint(str(tmp_path / "c.ckpt"), tree, step=42, epoch=7)
        state, step, epoch = load_checkpoint(p, target=tree)
        assert step == 42 and epoch == 7
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
            tree, state,
        )

    def test_rotation_window(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), max_save=3)
        for i in range(7):
            mgr.save(_tree(i), step=i, epoch=i * 2)
        files = [f for f in os.listdir(tmp_path) if f.endswith(".ckpt")]
        assert len(files) == 3  # window, not 7 files
        state, step, epoch = mgr.restore(target=_tree(0))
        assert step == 6 and epoch == 12
        np.testing.assert_allclose(np.asarray(state["prop"]["w"]), 6.0)

    def test_resume_counters_across_manager_instances(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), max_save=2)
        mgr.save(_tree(1), step=10, epoch=1)
        # a fresh manager (new process) continues the rotation + resumes
        mgr2 = CheckpointManager(str(tmp_path), max_save=2)
        _, step, epoch = mgr2.restore(target=_tree(0))
        assert (step, epoch) == (10, 1)
        mgr2.save(_tree(2), step=20, epoch=2)
        _, step, _ = mgr2.restore(target=_tree(0))
        assert step == 20

    def test_empty_restore(self, tmp_path):
        assert CheckpointManager(str(tmp_path)).restore() is None


class TestTimer:
    def test_windowed_mean_and_eta(self):
        t = [0.0]

        def clock():
            return t[0]

        timer = Timer(window=2, clock=clock)
        for dt in (1.0, 2.0, 4.0):  # window keeps the last two: 2, 4
            timer.tic()
            t[0] += dt
            timer.toc()
        assert timer.get_mean_time() == pytest.approx(3.0)
        assert timer.remaining_time(10) == pytest.approx(30.0)
        assert timer.eta_str(10) == "30s"
        assert Timer.format_seconds(3723) == "1h 2m 3s"

    def test_record_feeds_the_same_window(self):
        timer = Timer(window=2)
        for dt in (1.0, 2.0, 4.0):  # pipelined-trainer style external marks
            timer.record(dt)
        assert timer.get_mean_time() == pytest.approx(3.0)


class TestMetricsWriter:
    def test_jsonl_mirror(self, tmp_path):
        with MetricsWriter(run_dir=str(tmp_path / "run"), use_tensorboard=False) as w:
            w.add_scalar("Train Loss", 0.5, 1)
            w.add_scalars({"PSNR": 30.0, "Learning Rate": 1e-4}, 2)
        lines = [json.loads(l) for l in
                 open(tmp_path / "run" / "metrics.jsonl")]
        assert {l["tag"] for l in lines} == {"Train Loss", "PSNR", "Learning Rate"}
        assert lines[0]["step"] == 1 and lines[0]["value"] == 0.5

    def test_timestamped_run_dir(self, tmp_path):
        w = MetricsWriter(base_dir=str(tmp_path / "logs"), epochs=2400,
                          use_tensorboard=False)
        assert "epoch2400" in w.run_dir and os.path.isdir(w.run_dir)
        w.close()


class TestImage:
    def test_to_uint8_clip_and_gray(self):
        out = to_uint8(np.array([[[1.5], [-0.2]]], np.float32))
        assert out.shape == (1, 2, 3)
        assert out[0, 0, 0] == 255 and out[0, 1, 0] == 0

    def test_grid_layout(self, tmp_path):
        imgs = [np.full((4, 6, 3), v, np.float32) for v in (0.0, 0.5, 1.0)]
        p = save_image_grid(str(tmp_path / "g.png"), imgs, nrow=3)
        from PIL import Image

        grid = np.asarray(Image.open(p))
        assert grid.shape == (4, 3 * 6 + 2 * 2, 3)  # one row, 2px padding


class TestDebug:
    def test_check_finite_raises_with_path(self):
        bad = {"a": jnp.ones(3), "b": jnp.array([1.0, jnp.nan])}
        with pytest.raises(FloatingPointError, match="b"):
            check_finite(bad, "grads")
        check_finite({"a": jnp.ones(3)})  # no raise

    def test_nan_debug_restores_flag(self):
        before = jax.config.jax_debug_nans
        with nan_debug(True):
            assert jax.config.jax_debug_nans
        assert jax.config.jax_debug_nans == before

    def test_nan_attribution_names_offending_module(self):
        """-b parity, the attributed half: the failure must name the
        SUBMODULE that produced the NaN (reference nan_hook prints the
        module class, nerf_helper.py:26-36; we get the full flax path)."""
        import flax
        import flax.linen as nn

        from nerf_tpu.utils.debug import nan_attribution

        class Block(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.Dense(4)(x)

        class Net(nn.Module):
            @nn.compact
            def __call__(self, x):
                return Block(name="second")(Block(name="first")(x))

        net = Net()
        x = jnp.ones((2, 4))
        params = flax.core.unfreeze(net.init(jax.random.PRNGKey(0), x))
        kern = params["params"]["second"]["Dense_0"]["kernel"]
        params["params"]["second"]["Dense_0"]["kernel"] = (
            kern.at[0, 0].set(jnp.nan))

        with nan_attribution():
            f = jax.jit(lambda p, x: net.apply(p, x))
            with pytest.raises(Exception, match="second/Dense_0"):
                jax.block_until_ready(f(params, x))

    def test_nan_attribution_through_real_model(self):
        """Poisoning one VanillaNeRF layer must attribute the NaN to that
        layer's flax path, not just 'somewhere in the forward'."""
        import flax

        from nerf_tpu.train.config import PipelineConfig
        from nerf_tpu.train.pipeline import init_variables, make_models
        from nerf_tpu.utils.debug import nan_attribution

        cfg = PipelineConfig(ray_batch=8, n_coarse=8, n_fine=8,
                             nerf_width=16, prop_width=16, model="vanilla")
        nerf, _ = make_models(cfg)
        variables = flax.core.unfreeze(
            init_variables(cfg, jax.random.PRNGKey(0)))
        kern = variables["nerf"]["block2"]["Dense_1"]["kernel"]
        variables["nerf"]["block2"]["Dense_1"]["kernel"] = (
            kern.at[0, 0].set(jnp.nan))

        pos = jnp.ones((4, 3)) * 0.1
        dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))
        with nan_attribution():
            f = jax.jit(lambda v: nerf.apply(
                {"params": v["nerf"]}, pos, dirs))
            with pytest.raises(Exception, match="block2/Dense_1"):
                jax.block_until_ready(f(variables))

    def test_nan_attribution_flag_mode_attributes_through_compute_loss(self):
        """Callback-free -b (axon tunnel: host callbacks rejected): the
        per-module finite flags compiled into the step must ride the metrics
        out of jit and name the poisoned module on the host check."""
        import flax

        from nerf_tpu.data.synthetic import make_synthetic_scene
        from nerf_tpu.train.config import PipelineConfig
        from nerf_tpu.train.pipeline import init_variables, make_models
        from nerf_tpu.train.step import compute_loss, sample_train_rays
        from nerf_tpu.utils.debug import (
            nan_attribution, raise_on_nan_flags, split_nan_flags,
        )

        cfg = PipelineConfig(ray_batch=8, n_coarse=8, n_fine=8,
                             nerf_width=16, prop_width=16, model="vanilla",
                             use_pallas=False)
        models = make_models(cfg)
        variables = flax.core.unfreeze(
            init_variables(cfg, jax.random.PRNGKey(0)))
        kern = variables["nerf"]["block2"]["Dense_1"]["kernel"]
        variables["nerf"]["block2"]["Dense_1"]["kernel"] = (
            kern.at[0, 0].set(jnp.nan))

        train, _, _ = make_synthetic_scene(n_train=2, n_test=1, hw=(16, 16),
                                           seed=0, n_samples=16)
        rays, rgb_gt = sample_train_rays(
            jax.random.PRNGKey(0), jnp.asarray(train.pixel_pool()),
            jnp.asarray(train.poses), 0, train.image_hw, train.focal(), 8)

        with nan_attribution(mode="flags"):
            f = jax.jit(lambda v: compute_loss(
                models, v, rays, rgb_gt, jax.random.PRNGKey(1), cfg))
            _, metrics = jax.block_until_ready(f(variables))
        plain, flags = split_nan_flags(metrics)
        assert any("block2" in k for k in flags), flags.keys()
        assert "loss" in plain and not any(
            k.startswith("nan_flag:") for k in plain)
        with pytest.raises(FloatingPointError, match="block2"):
            raise_on_nan_flags(flags)
        # healthy modules must not be flagged... but NaN propagates forward
        # through downstream modules, so only check modules upstream of the
        # poisoned layer
        for k, v in flags.items():
            if "prop" in k or "block1" in k:
                assert not np.asarray(v).any(), k

    def test_nan_attribution_flag_mode_survives_foreign_traces(self):
        """While flag mode is armed for the process lifetime, UNDRAINED
        traces (the jitted eval render chunks, a retraced epoch fn) leave
        stale tracers in the sink; the next compute_loss trace must discard
        them instead of merging them (UnexpectedTracerError — ADVICE r4
        medium).  Reproduces the standard trainer flow: train trace → eval
        trace → train RETRACE."""
        from nerf_tpu.data.synthetic import make_synthetic_scene
        from nerf_tpu.train.config import PipelineConfig
        from nerf_tpu.train.pipeline import (
            init_variables, make_models, render_rays_eval,
        )
        from nerf_tpu.train.step import compute_loss, sample_train_rays
        from nerf_tpu.utils.debug import nan_attribution, split_nan_flags

        cfg = PipelineConfig(ray_batch=8, n_coarse=8, n_fine=8,
                             nerf_width=16, prop_width=16, model="vanilla",
                             use_pallas=False)
        models = make_models(cfg)
        variables = init_variables(cfg, jax.random.PRNGKey(0))
        train, _, _ = make_synthetic_scene(n_train=2, n_test=1, hw=(16, 16),
                                           seed=0, n_samples=16)
        rays, rgb_gt = sample_train_rays(
            jax.random.PRNGKey(0), jnp.asarray(train.pixel_pool()),
            jnp.asarray(train.poses), 0, train.image_hw, train.focal(), 8)

        with nan_attribution(mode="flags"):
            loss_fn = jax.jit(lambda v, r, g: compute_loss(
                models, v, r, g, jax.random.PRNGKey(1), cfg))
            jax.block_until_ready(loss_fn(variables, rays, rgb_gt))
            # eval-style trace that NOBODY drains: its flag tracers go stale
            # the moment this jit trace completes
            ev = jax.jit(lambda v: render_rays_eval(
                models, v, rays, jax.random.PRNGKey(2), cfg)[0])
            jax.block_until_ready(ev(variables))
            # force a compute_loss RETRACE (new ray_batch shape) — pre-fix
            # this merged the stale eval tracers and raised
            # UnexpectedTracerError
            rays2, rgb2 = sample_train_rays(
                jax.random.PRNGKey(3), jnp.asarray(train.pixel_pool()),
                jnp.asarray(train.poses), 0, train.image_hw, train.focal(), 4)
            _, metrics = jax.block_until_ready(loss_fn(variables, rays2, rgb2))
        _, flags = split_nan_flags(metrics)
        assert flags, "retrace must still collect its own flags"
        assert not any(bool(np.asarray(v).any()) for v in flags.values())

    def test_nan_attribution_flag_mode_empty_on_clean_model(self):
        from nerf_tpu.utils.debug import attach_nan_flags, nan_attribution

        import flax.linen as nn

        model = nn.Dense(8)
        x = jnp.linspace(-1.0, 1.0, 12).reshape(3, 4)
        params = model.init(jax.random.PRNGKey(1), x)
        with nan_attribution(mode="flags"):
            def fn(p):
                out = model.apply(p, x)
                m = attach_nan_flags({"out_sum": out.sum()})
                return out, m

            out, m = jax.jit(fn)(params)
        flags = {k: v for k, v in m.items() if k.startswith("nan_flag:")}
        assert flags, "flag mode must collect flags for float outputs"
        assert not any(bool(np.asarray(v).any()) for v in flags.values())

    def test_nan_attribution_transparent_when_finite(self):
        """The hooks must not change values: same outputs with and without
        the context on a clean model."""
        import flax.linen as nn

        from nerf_tpu.utils.debug import nan_attribution

        model = nn.Dense(8)
        x = jnp.linspace(-1.0, 1.0, 12).reshape(3, 4)
        params = model.init(jax.random.PRNGKey(1), x)
        ref = model.apply(params, x)
        with nan_attribution():
            out = jax.jit(model.apply)(params, x)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_flops_model_matches_hand_count():
    """train_step_flops: hand-counted MACs for a tiny config, all models."""
    import jax

    from nerf_tpu.train.config import PipelineConfig
    from nerf_tpu.train.pipeline import init_variables
    from nerf_tpu.utils.flops import mfu, train_step_flops

    cfg = PipelineConfig(model="vanilla", ray_batch=4, n_coarse=8, n_fine=16,
                         nerf_width=32, prop_width=32)
    params = init_variables(cfg, jax.random.PRNGKey(0))
    # prop MACs/pt: 63*32 + 3*32*32 + 32*1 = 5120
    # vanilla fine MACs/pt (hidden=32, bottleneck stays at its default 256):
    #   block1 63*32 + 3*32*32 = 5088
    #   block2 (63+32)*32 + 32*32 + 32*256 = 12256
    #   sigma 256*1 = 256; bottle_neck 256*256 = 65536
    #   rgb (256+27)*128 + 128*3 = 36608          -> total 119744
    want = 2.0 * 4 * (16 * 3 * 119744 + 8 * 3 * 5120)
    got = train_step_flops(cfg, params)
    assert got == want, (got, want)
    assert abs(mfu(cfg, params, 1000.0, peak_flops=1e9)
               - (1000.0 / 4) * want / 1e9) < 1e-9

    for model in ("ref", "mip"):
        cfg_m = cfg.replace(model=model)
        p_m = init_variables(cfg_m, jax.random.PRNGKey(0))
        assert train_step_flops(cfg_m, p_m) > 0
