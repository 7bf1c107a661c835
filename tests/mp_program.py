"""The shared sharded program run by BOTH the single-process oracle (the
pytest process, 8 local virtual devices) and each process of the 2-process
distributed job (tests/mp_worker.py, 4 local + 4 remote devices).

Same seeds, same mesh shape, same global-array staging -> the results must
agree: that equivalence is exactly what makes multi-process execution
correct (a multi-controller SPMD program computes the same function as its
single-controller counterpart).
"""

from __future__ import annotations

import numpy as np
import jax


def run_program():
    """One DP train step + one weighted MA average on a (2, 4) global mesh.

    Returns {"loss": float, "psnr": float, "checksums": [per-leaf sums]}.
    """
    import jax.numpy as jnp

    from nerf_tpu.data.synthetic import make_synthetic_scene
    from nerf_tpu.parallel import (
        host_to_global,
        make_average_fn,
        make_mesh,
        make_parallel_train_step,
        stack_state,
        tree_to_host,
    )
    from nerf_tpu.train import schedule
    from nerf_tpu.train.config import PipelineConfig
    from nerf_tpu.train.pipeline import init_variables, make_models
    from nerf_tpu.train.step import make_optimizer

    n_replica, n_data = 2, 4
    mesh = make_mesh(n_data=n_data, n_replica=n_replica)

    cfg = PipelineConfig(model="vanilla", ray_batch=8, n_coarse=8, n_fine=8,
                         nerf_width=16, prop_width=16)
    models = make_models(cfg)
    params = init_variables(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg, schedule.decay_schedule(1e-3, warmup_step=0),
                        grad_clip=1.0)
    state = stack_state(params, tx, n_replica, mesh=mesh)

    train, _, _ = make_synthetic_scene(n_train=8, n_test=1, hw=(16, 16),
                                       seed=0, n_samples=16)
    pool = host_to_global(train.pixel_pool(), mesh)
    poses = host_to_global(train.poses, mesh)
    img_idx = host_to_global(
        np.arange(8, dtype=np.int32).reshape(n_replica, n_data), mesh)

    step = make_parallel_train_step(models, tx, cfg, train.image_hw,
                                    train.focal(), mesh, donate=False)
    state, metrics = step(state, pool, poses, img_idx)

    avg_fn = make_average_fn(mesh, "all_reduce")
    weights = host_to_global(
        np.asarray([0.25, 0.75], np.float32), mesh)
    averaged = avg_fn(state.params, weights)

    host_params = tree_to_host(averaged, mesh)
    leaves = jax.tree_util.tree_leaves(host_params)
    return {
        "loss": float(np.asarray(jax.device_get(metrics["loss"]))),
        "psnr": float(np.asarray(jax.device_get(metrics["psnr"]))),
        "checksums": [float(np.abs(l).sum()) for l in leaves],
    }


def run_ddp_trainer(dataset_root: str, workdir: str):
    """Full DDP Trainer run across the global mesh (grad pmean over 'data');
    returns final-param checksums."""
    import os

    from nerf_tpu.cli import Trainer, get_parser

    os.chdir(workdir)
    parser = get_parser()
    parser.add_argument("--no_sync_prop", default=False, action="store_true")
    args = parser.parse_args([
        "--dataset_root", dataset_root, "--dataset_name", "lego",
        "--epochs", "2", "--sample_ray_num", "16",
        "--coarse_sample_pnum", "8", "--fine_sample_pnum", "8",
        "--nerf_net_width", "16", "--prop_net_width", "16",
        "--img_scale", "1.0", "--output_time", "1000", "--eval_time", "10",
        "--no_tensorboard", "-w",
    ])
    t = Trainer(args, mode="ddp")
    assert t.n_data == 8
    state = t.train()
    from nerf_tpu.parallel import tree_to_host

    host = tree_to_host(state.params, t.mesh)
    leaves = jax.tree_util.tree_leaves(host)
    return {"checksums": [float(np.abs(l).sum()) for l in leaves],
            "step": int(state.step)}


def run_ma_trainer(dataset_root: str, workdir: str):
    """Full MA Trainer run (2 epochs, averaging each epoch) on the global
    mesh; returns final-param checksums.  Exercises the whole multi-process
    trainer path: global-array staging, the sharded epoch scan, weighted
    averaging, rank-0-gated checkpoints/logs/renders."""
    import os

    from nerf_tpu.cli import Trainer, get_parser

    os.chdir(workdir)
    parser = get_parser()
    parser.add_argument("--ma_epoch", type=int, default=1)
    parser.add_argument("--ma_method", type=str, default="all_reduce")
    parser.add_argument("-div", "--div", default=False, action="store_true")
    parser.add_argument("--allow_imbalanced", default=False,
                        action="store_true")
    parser.add_argument("--num_replicas", type=int, default=None)
    args = parser.parse_args([
        "--dataset_root", dataset_root, "--dataset_name", "lego",
        "--epochs", "2", "--sample_ray_num", "16",
        "--coarse_sample_pnum", "8", "--fine_sample_pnum", "8",
        "--nerf_net_width", "16", "--prop_net_width", "16",
        "--img_scale", "1.0", "--output_time", "1000", "--eval_time", "10",
        "--no_tensorboard", "-w", "--num_replicas", "2",
    ])
    t = Trainer(args, mode="ma")
    assert t.n_replica == 2 and t.n_data == 4  # 2x4 over the 8 global devices
    state = t.train()
    from nerf_tpu.parallel import tree_to_host

    host = tree_to_host(state.params, t.mesh)
    leaves = jax.tree_util.tree_leaves(host)
    return {"checksums": [float(np.abs(l).sum()) for l in leaves],
            "step": int(state.step)}
