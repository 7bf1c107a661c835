"""Eval/render-path A/B: XLA forward vs forward-only fused kernels.

VERDICT r4 weak #3: the render_rays_eval use_pallas=False pin cites a round-2
measurement taken against the RECOMPUTE-form kernels; the residual-form
forward measured faster in round 4, and a no-residual no-grad forward was
never tried at eval shapes.  This tool times one full-frame render (the real
render_image path, lax.map-chunked) under:

  xla          — the pinned default (use_pallas=False)
  pallas-fwd   — fused kernels, store_residuals=False (pure forward, no
                 residual HBM writes; custom_vjp fwd never runs outside grad)
  pallas-res   — fused kernels, store_residuals=True (the training default's
                 forward, pays the activation writes for nothing at eval)

and a chunk sweep for the winner.  Frame-level wall timing (one lax.map
program per frame; serial by construction).

Run as: python -m tools.eval_ab [--model ref|vanilla|mip] [--hw 400]
"""

import argparse
import sys
import time

import numpy as np
import jax


def time_frame(cfg, hw, chunk, n_rep=5):
    from nerf_tpu.core import rays as rays_lib
    from nerf_tpu.train.pipeline import init_variables
    from nerf_tpu.train.renderer import render_image

    pose = rays_lib.pose_spherical(30.0, -30.0, 4.0)
    focal = rays_lib.fov_to_focal(0.6911112070083618, hw)
    variables = init_variables(cfg, jax.random.PRNGKey(0))
    # compile + warmup
    out = render_image(variables, pose, hw, focal, cfg, chunk=chunk)
    best = float("inf")
    for _ in range(n_rep):
        t0 = time.perf_counter()
        out = render_image(variables, pose, hw, focal, cfg, chunk=chunk)
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(out["rgb"]).all()
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vanilla",
                    choices=["vanilla", "ref", "mip"])
    ap.add_argument("--hw", type=int, default=400)
    ap.add_argument("--chunks", type=int, nargs="+", default=[4096])
    args = ap.parse_args()

    from nerf_tpu.train.config import PipelineConfig

    hw = (args.hw, args.hw)
    base = dict(ray_batch=1024, n_coarse=64, n_fine=128, nerf_width=256,
                prop_width=256, white_bkg=True, use_bf16=True,
                model=args.model)
    print(f"devices: {jax.devices()} model={args.model} hw={hw}",
          file=sys.stderr)
    for chunk in args.chunks:
        for name, kw in (
            ("xla", dict(eval_use_pallas=False)),
            ("pallas-fwd", dict(eval_use_pallas=True, store_residuals=False)),
            ("pallas-res", dict(eval_use_pallas=True, store_residuals=True)),
        ):
            cfg = PipelineConfig(**base, **kw)
            try:
                dt = time_frame(cfg, hw, chunk)
            except Exception as e:  # noqa: BLE001 — report and continue
                print(f"chunk={chunk:6d} {name:10s} FAILED: {e}",
                      file=sys.stderr)
                continue
            print(f"chunk={chunk:6d} {name:10s} {dt*1e3:9.1f} ms/frame",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
