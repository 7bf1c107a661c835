"""Benchmark: training-step ray throughput on the reference's default config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference sustains ~7.9k rays/s on an RTX 3060
at the default config — 1024 rays/step, 64 coarse + 128 fine samples,
256-wide MLPs, half-res Blender lego (README.md:150 + procedures.py:168-194).
This benchmark runs the identical workload shape end to end (pixel sampling,
ray gen, proposal net, inverse-CDF sampling, fine MLP, composite, losses,
Adam update — all inside one compiled step) on one TPU chip.
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

BASELINE_RAYS_PER_SEC = 7900.0


def main():
    from nerf_tpu.data.synthetic import make_synthetic_scene
    from nerf_tpu.train import schedule
    from nerf_tpu.train.config import PipelineConfig
    from nerf_tpu.train.pipeline import init_variables, make_models
    from nerf_tpu.train.step import (
        create_train_state, make_epoch_step, make_optimizer,
    )

    cfg = PipelineConfig(ray_batch=1024, n_coarse=64, n_fine=128,
                         nerf_width=256, prop_width=256, white_bkg=True,
                         use_bf16=True)

    print(f"devices: {jax.devices()}", file=sys.stderr)
    train, _, _ = make_synthetic_scene(n_train=20, n_test=1, hw=(400, 400),
                                       seed=0, n_samples=96)
    pool = jax.device_put(jnp.asarray(train.pixel_pool()))
    poses = jax.device_put(jnp.asarray(train.poses))

    models = make_models(cfg)
    params = init_variables(cfg, jax.random.PRNGKey(0))
    lr = schedule.scaled_base_lr(1.5e-4, cfg.ray_batch)
    tx = make_optimizer(cfg, schedule.decay_schedule(lr, warmup_step=500))
    state = create_train_state(params, tx)

    steps_per_scan = 50
    epoch = make_epoch_step(models, tx, cfg, train.image_hw, train.focal())
    order = jnp.arange(steps_per_scan, dtype=jnp.int32) % len(train)

    # warmup / compile
    t0 = time.perf_counter()
    state, metrics = epoch(state, pool, poses, order)
    jax.block_until_ready(state.params)
    print(f"compile+first scan: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    best = 0.0
    for _ in range(4):
        t0 = time.perf_counter()
        state, metrics = epoch(state, pool, poses, order)
        jax.block_until_ready(state.params)
        dt = time.perf_counter() - t0
        rays_per_sec = steps_per_scan * cfg.ray_batch / dt
        best = max(best, rays_per_sec)
        print(f"scan: {dt*1e3:.1f} ms, {rays_per_sec:,.0f} rays/s, "
              f"psnr={float(metrics['psnr'][-1]):.2f}", file=sys.stderr)

    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": round(best, 1),
        "unit": "rays/s",
        "vs_baseline": round(best / BASELINE_RAYS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
