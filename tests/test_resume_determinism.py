"""Bit-deterministic resume: checkpoint/restore must continue the exact
trajectory (the PRNG is keyed on the step counter, so resume replays the
same pixel picks and noise — a guarantee the reference does not have, since
it never seeds its single-GPU path)."""

import os
import signal
import subprocess
import sys
import textwrap

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.data.synthetic import make_synthetic_scene
from nerf_tpu.train import schedule
from nerf_tpu.train.config import PipelineConfig
from nerf_tpu.train.pipeline import init_variables, make_models
from nerf_tpu.train.step import (
    create_train_state, make_optimizer, make_train_step,
)
from nerf_tpu.utils import load_checkpoint, save_checkpoint


def test_resume_bit_determinism(tmp_path):
    cfg = PipelineConfig(ray_batch=16, n_coarse=8, n_fine=16, nerf_width=16,
                         prop_width=16)
    train, _, _ = make_synthetic_scene(n_train=4, n_test=1, hw=(16, 16),
                                       seed=0, n_samples=16)
    pool, poses = jnp.asarray(train.pixel_pool()), jnp.asarray(train.poses)
    models = make_models(cfg)
    params = init_variables(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg, schedule.decay_schedule(1e-3, warmup_step=0))
    step = make_train_step(models, tx, cfg, train.image_hw, train.focal(),
                           donate=False)

    # continuous run: 6 steps
    s = create_train_state(params, tx)
    for i in range(6):
        s, _ = step(s, pool, poses, jnp.int32(i % 4))

    # interrupted run: 3 steps, checkpoint to disk, restore, 3 more
    s2 = create_train_state(params, tx)
    for i in range(3):
        s2, _ = step(s2, pool, poses, jnp.int32(i % 4))
    p = save_checkpoint(str(tmp_path / "c.ckpt"), s2, step=3, epoch=0)
    s2r, st, _ = load_checkpoint(p, target=s2)
    assert st == 3
    for i in range(3, 6):
        s2r, _ = step(s2r, pool, poses, jnp.int32(i % 4))

    for a, b in zip(jax.tree.leaves(s.params), jax.tree.leaves(s2r.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sigterm_checkpoints_and_resumes(tmp_path):
    """Preemption drill through the real CLI: SIGTERM mid-train must leave a
    resumable checkpoint."""
    from nerf_tpu.data.synthetic import write_blender_dataset

    train, test, (tr_p, te_p) = make_synthetic_scene(
        n_train=4, n_test=1, hw=(16, 16), seed=0, n_samples=16)
    write_blender_dataset(str(tmp_path / "data" / "lego"), train, tr_p, "train")
    write_blender_dataset(str(tmp_path / "data" / "lego"), test, te_p, "test")

    script = textwrap.dedent("""
        import os, signal, sys, threading
        # force the CPU backend via jax.config, not just the env var: the
        # environment's site hook (sitecustomize -> axon register()) wraps
        # xla_bridge._get_backend_uncached and re-injects the TPU plugin
        # AFTER JAX_PLATFORMS is read, so with the env var alone the child
        # dials the TPU tunnel on its first op — and hangs past the
        # subprocess timeout whenever the tunnel is wedged (seen
        # 2026-08-17).  Same guard as tests/conftest.py and mp_worker.py.
        import jax
        jax.config.update('jax_platforms', 'cpu')
        sys.argv = ['train.py', '--dataset_root', 'data', '--dataset_name',
                    'lego', '--epochs', '20', '--sample_ray_num', '16',
                    '--coarse_sample_pnum', '8', '--fine_sample_pnum', '8',
                    '--nerf_net_width', '16', '--prop_net_width', '16',
                    '--img_scale', '1.0', '--no_tensorboard',
                    '--output_time', '100000']
        from nerf_tpu.cli import Trainer, get_parser
        args = get_parser().parse_args(sys.argv[1:])
        t = Trainer(args, mode='single')
        # deliver SIGTERM to ourselves after a few epochs
        orig = t.run_epoch
        def hooked(ep):
            out = orig(ep)
            if ep == 3:
                os.kill(os.getpid(), signal.SIGTERM)
            return out
        t.run_epoch = hooked
        t.train()
    """)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""))
    # the child runs only 4 epochs (SIGTERM after ep 3); the budget covers
    # interpreter start + CPU compiles, deterministically under 300 s
    r = subprocess.run([sys.executable, "-c", script], cwd=tmp_path,
                       capture_output=True, text=True, timeout=300, env=env)
    assert r.returncode == 128 + signal.SIGTERM, r.stderr[-2000:]
    assert "checkpointed step" in r.stdout

    # the checkpoint is resumable and carries the interrupted counters
    from nerf_tpu.utils import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "check_points" / "lego"),
                            prefix="model_1_chkpt")
    restored = mgr.restore()
    assert restored is not None
    _, step, epoch = restored
    assert step == 16 and epoch == 3  # 4 epochs x 4 images, killed after ep 3
