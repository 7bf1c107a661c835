"""Ray-batch scaling of the full train step: fused vs matmul selection.

Round-1 finding (VERDICT "What's weak" #3): throughput COLLAPSED from 131.6k
rays/s at R=1024 to 95.7k at R=2^14 because the one-hot selection matmuls in
weight_bounds / merge_coarse_fine / sample_pdf materialize (R, N, M) f32
MXU operands in HBM — gigabytes per step at R=2^14.  The fused
compare+where+reduce forms (fastmath.onehot_select) never materialize them.
This script measures the full train step at several ray batches for both
paths.  Serial-by-construction timing: each measurement is one lax.scan with
a carried dependency (independent jit calls run concurrently on this
backend, see tools/profile_step.py).

Run as: python -m tools.batch_scaling [--model ref|vanilla]
"""

import argparse
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def measure(cfg, n_scan=100):
    # 100-step scans: at 20 steps the per-scan host sync/dispatch overhead
    # depressed readings ~6-14% vs bench.py's 250-step scans (round-2 table
    # read 131k where the bench read 139.7k at the same config)
    from nerf_tpu.data.synthetic import make_synthetic_scene
    from nerf_tpu.train import schedule
    from nerf_tpu.train.pipeline import init_variables, make_models
    from nerf_tpu.train.step import (
        create_train_state, make_epoch_step, make_optimizer,
    )

    from nerf_tpu.cli.flags import finalize_config

    train, _, _ = make_synthetic_scene(n_train=8, n_test=1, hw=(400, 400),
                                       seed=0, n_samples=64)
    cfg = finalize_config(cfg, train.focal())  # mip: resolve ipe_radius
    pool = jax.device_put(jnp.asarray(train.pixel_pool()))
    poses = jax.device_put(jnp.asarray(train.poses))
    models = make_models(cfg)
    params = init_variables(cfg, jax.random.PRNGKey(0))
    lr = schedule.scaled_base_lr(1.5e-4, cfg.ray_batch)
    tx = make_optimizer(cfg, schedule.decay_schedule(lr, warmup_step=500))
    state = create_train_state(params, tx)
    epoch = make_epoch_step(models, tx, cfg, train.image_hw, train.focal())
    order = jnp.arange(n_scan, dtype=jnp.int32) % len(train)

    state, _ = epoch(state, pool, poses, order)  # compile + warmup
    jax.block_until_ready(state.params)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        state, _ = epoch(state, pool, poses, order)
        jax.block_until_ready(state.params)
        dt = time.perf_counter() - t0
        best = max(best, n_scan * cfg.ray_batch / dt)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vanilla",
                    choices=["vanilla", "ref", "mip"])
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[1024, 4096, 16384])
    ap.add_argument("--axis", default="select",
                    choices=["select", "pallas", "residuals", "prop_res",
                             "tile", "pe", "bufs"],
                    help="'select': fused vs matmul endpoint selects; "
                         "'pallas': fused kernels vs the XLA path; "
                         "'residuals': residual-storing vs recompute-form "
                         "kernel backwards (HBM-write vs re-FLOP trade, "
                         "stressed at large R); 'prop_res': PROP kernel "
                         "residual vs recompute with the fine kernel held "
                         "residual (tools/roofline.py prices the prop trade "
                         "the opposite way from the fine net's); "
                         "'tile': pallas_tile sweep at shipping defaults "
                         "(re-measure tile limits after residual changes — "
                         "the 64 MB scoped-VMEM raise may admit 2048); "
                         "'pe': angle-doubling vs matmul+sin spatial PE "
                         "(fastmath.cat_pos_pe); "
                         "'bufs': backward-kernel input pipeline buffer "
                         "count sweep (pl.Buffered; 0 = Mosaic default) — "
                         "probed the residual-read DMA overlap lever; "
                         "CLOSED: this Mosaic rejects buffer_count > 2 "
                         "at compile (round-5 on-chip A/B)")
    ap.add_argument("--tiles", type=int, nargs="+", default=[512, 1024, 2048],
                    help="tile values for --axis tile")
    ap.add_argument("--bufs", type=int, nargs="+", default=[0, 3, 4],
                    help="buffer counts for --axis bufs (0 = default)")
    args = ap.parse_args()

    from nerf_tpu.train.config import PipelineConfig

    print(f"devices: {jax.devices()}  model={args.model} axis={args.axis}",
          file=sys.stderr)
    variants = {"select": ("fused", "matmul"),
                "pallas": ("pallas", "xla"),
                "residuals": ("resid", "recompute"),
                "prop_res": ("resid", "recompute"),
                "pe": ("dbl", "sin"),
                "tile": tuple(str(t) for t in args.tiles),
                "bufs": tuple(str(b) for b in args.bufs)}[args.axis]
    rows = []
    for r in args.batches:
        for variant in variants:
            use_pallas = None
            kw = {}
            if args.axis == "select":
                import nerf_tpu.core.sampling as sampling_mod
                sampling_mod.DEFAULT_SELECT = variant
            elif args.axis == "pallas":
                use_pallas = variant == "pallas"
            elif args.axis == "residuals":
                use_pallas = True
                kw["store_residuals"] = variant == "resid"
            elif args.axis == "tile":
                use_pallas = True
                kw["pallas_tile"] = int(variant)
            elif args.axis == "pe":
                use_pallas = True
                kw["pe_doubling"] = variant == "dbl"
            elif args.axis == "bufs":
                use_pallas = True
                kw["bwd_bufs"] = int(variant) or None
            else:  # prop_res: fine stays residual-form, prop swings
                use_pallas = True
                kw["store_residuals"] = True
                kw["prop_store_residuals"] = variant == "resid"
            cfg = PipelineConfig(ray_batch=r, n_coarse=64, n_fine=128,
                                 nerf_width=256, prop_width=256,
                                 white_bkg=True, use_bf16=True,
                                 model=args.model, use_pallas=use_pallas,
                                 use_ipe=args.model == "mip", **kw)
            try:
                rps = measure(cfg)
            except Exception as e:  # noqa: BLE001 — a tile that exceeds
                # scoped VMEM should not kill the rest of the sweep
                print(f"R={r:6d} {variant:6s} FAILED: {e}", file=sys.stderr)
                continue
            rows.append((r, variant, rps))
            print(f"R={r:6d} {variant:6s} {rps:12,.0f} rays/s",
                  file=sys.stderr)
    print("\nsummary:", file=sys.stderr)
    for r, s, v in rows:
        print(f"  R={r:6d} {s:6s} {v:12,.0f} rays/s", file=sys.stderr)


if __name__ == "__main__":
    main()
