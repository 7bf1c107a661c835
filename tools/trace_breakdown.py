"""Op-level trace breakdown of the train step on the real chip.

Captures a steady-state `lax.scan` epoch under jax.profiler.trace and
aggregates the device-op timeline into a per-step table — the measurement
protocol behind the BENCHMARKS.md breakdowns.  Component microbenchmarks in
separate jits mislead (round-2 measured 1.7x inflation vs in-context cost);
this reads the real program's timeline instead.

Run on the chip:

    python -m tools.trace_breakdown --model vanilla            # fused default
    python -m tools.trace_breakdown --model ref --pallas on    # all-kernel ref
    python -m tools.trace_breakdown --model ref --pallas off   # XLA ref

Prints rays/s for the traced scan plus the top-N ops by total device time
(ms/step and % of step).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile
import time

import numpy as np


def parse_trace(trace_dir: str, steps: int):
    """Aggregate device-op SELF time from the newest .trace.json.gz.

    The device "XLA Ops" timeline is hierarchical (module/while spans
    contain the leaf ops), so each event's self time is its duration minus
    its direct children's — summing raw durations would double-count every
    container level.  Returns (rows, total_ms_per_step), rows =
    (name, ms_per_step, pct) sorted descending.
    """
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]

    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pid_names[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")

    op_rows = [
        key for key, name in tid_names.items()
        if name == "XLA Ops" and "device" in pid_names.get(key[0], "").lower()
    ]
    if not op_rows:
        raise ValueError(
            f"no device 'XLA Ops' timeline in {paths[-1]}; "
            f"threads: {sorted(set(tid_names.values()))}")

    by_name = collections.Counter()
    for row in op_rows:
        evs = sorted(
            (e for e in events
             if e.get("ph") == "X" and "dur" in e
             and (e["pid"], e["tid"]) == row),
            key=lambda e: (e["ts"], -e["dur"]))
        # stack sweep: subtract each event's duration from its parent
        stack = []  # (end_ts, name, self_us)
        for e in evs:
            ts, dur = e["ts"], e["dur"]
            while stack and stack[-1][0] <= ts:
                _, nm, self_us = stack.pop()
                by_name[nm] += self_us
            if stack:
                stack[-1][2] -= dur
            stack.append([ts + dur, e["name"], float(dur)])
        while stack:
            _, nm, self_us = stack.pop()
            by_name[nm] += self_us

    total_us = sum(by_name.values())
    rows = [(name, us / steps / 1e3, 100.0 * us / total_us)
            for name, us in by_name.most_common()]
    return rows, total_us / steps / 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vanilla",
                    choices=["vanilla", "ref", "mip"])
    ap.add_argument("--pallas", default="auto", choices=["auto", "on", "off"])
    ap.add_argument("--ref_kernels", default="all",
                    choices=["hybrid", "all"])
    ap.add_argument("--rays", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--hw", type=int, default=400)
    ap.add_argument("--trace_dir", default=None,
                    help="keep the trace here (default: temp dir)")
    ap.add_argument("--eval", action="store_true",
                    help="trace ONE render_image frame (the eval path, "
                         "lax.map-chunked) instead of the train scan — "
                         "names the dominant cost inside the s/frame "
                         "numbers (VERDICT r4 item 4)")
    ap.add_argument("--chunk", type=int, default=4096,
                    help="eval-mode render chunk")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nerf_tpu.data.synthetic import make_synthetic_scene
    from nerf_tpu.train import schedule
    from nerf_tpu.train.config import PipelineConfig
    from nerf_tpu.train.pipeline import init_variables, make_models
    from nerf_tpu.train.step import (
        create_train_state, make_epoch_step, make_optimizer,
    )

    use_pallas = {"auto": None, "on": True, "off": False}[args.pallas]
    cfg = PipelineConfig(ray_batch=args.rays, n_coarse=64, n_fine=128,
                         nerf_width=256, prop_width=256, white_bkg=True,
                         use_bf16=True, use_pallas=use_pallas,
                         model=args.model, ref_kernels=args.ref_kernels)

    print(f"devices: {jax.devices()}", file=sys.stderr)

    if args.eval:
        from nerf_tpu.core import rays as rays_lib
        from nerf_tpu.train.pipeline import init_variables as init_v
        from nerf_tpu.train.renderer import render_image

        # --pallas auto = the model-dependent eval pin (render_rays_eval);
        # on/off force the eval path via eval_use_pallas.
        eval_cfg = cfg.replace(eval_use_pallas=use_pallas)
        pose = rays_lib.pose_spherical(30.0, -30.0, 4.0)
        hw = (args.hw, args.hw)
        focal = rays_lib.fov_to_focal(0.6911112070083618, hw)
        variables = init_v(eval_cfg, jax.random.PRNGKey(0))

        def frame():
            out = render_image(variables, pose, hw, focal, eval_cfg,
                               chunk=args.chunk)
            jax.block_until_ready(out["rgb"])
            return out

        t0 = time.perf_counter()
        frame()
        print(f"compile+first frame: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        t0 = time.perf_counter()
        frame()
        dt = time.perf_counter() - t0
        print(f"steady-state: {dt * 1e3:.1f} ms/frame", file=sys.stderr)

        trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="nerf_trace_")
        with jax.profiler.trace(trace_dir):
            frame()
        rows, total = parse_trace(trace_dir, 1)
        print(f"\ntrace: {trace_dir}")
        print(f"EVAL model={args.model} pallas={args.pallas} "
              f"chunk={args.chunk} hw={args.hw}")
        print(f"untraced frame: {dt * 1e3:.1f} ms; "
              f"device-op total {total:.3f} ms/frame\n")
        print(f"{'op':<72s} {'ms/frm':>9s} {'%':>6s}")
        for name, ms, pct in rows[: args.top]:
            print(f"{name[:72]:<72s} {ms:9.4f} {pct:6.2f}")
        rest = rows[args.top:]
        if rest:
            ms = sum(r[1] for r in rest)
            print(f"{'(+%d more)' % len(rest):<72s} {ms:9.4f} "
                  f"{100.0 * ms / total:6.2f}")
        return

    train, _, _ = make_synthetic_scene(n_train=20, n_test=1,
                                       hw=(args.hw, args.hw), seed=0,
                                       n_samples=96)
    pool = jax.device_put(jnp.asarray(train.pixel_pool()))
    poses = jax.device_put(jnp.asarray(train.poses))

    models = make_models(cfg)
    params = init_variables(cfg, jax.random.PRNGKey(0))
    lr = schedule.scaled_base_lr(1.5e-4, cfg.ray_batch)
    tx = make_optimizer(cfg, schedule.decay_schedule(lr, warmup_step=500))
    state = create_train_state(params, tx)

    epoch = make_epoch_step(models, tx, cfg, train.image_hw, train.focal())
    order = jnp.arange(args.steps, dtype=jnp.int32) % len(train)

    t0 = time.perf_counter()
    state, _ = epoch(state, pool, poses, order)
    jax.block_until_ready(state.params)
    print(f"compile+first scan: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    # timed (untraced) scan for the headline rate
    t0 = time.perf_counter()
    state, _ = epoch(state, pool, poses, order)
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0
    rate = args.steps * cfg.ray_batch / dt
    print(f"steady-state: {dt / args.steps * 1e3:.3f} ms/step, "
          f"{rate:,.0f} rays/s", file=sys.stderr)

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="nerf_trace_")
    with jax.profiler.trace(trace_dir):
        state, _ = epoch(state, pool, poses, order)
        jax.block_until_ready(state.params)

    rows, total = parse_trace(trace_dir, args.steps)
    print(f"\ntrace: {trace_dir}")
    print(f"model={args.model} pallas={args.pallas} rays={args.rays} "
          f"steps={args.steps}")
    print(f"untraced step: {dt / args.steps * 1e3:.3f} ms  "
          f"({rate:,.0f} rays/s); device-op total {total:.3f} ms/step\n")
    print(f"{'op':<72s} {'ms/step':>9s} {'%':>6s}")
    for name, ms, pct in rows[: args.top]:
        print(f"{name[:72]:<72s} {ms:9.4f} {pct:6.2f}")
    rest = rows[args.top:]
    if rest:
        ms = sum(r[1] for r in rest)
        print(f"{'(+%d more)' % len(rest):<72s} {ms:9.4f} "
              f"{100.0 * ms / total:6.2f}")


if __name__ == "__main__":
    main()
