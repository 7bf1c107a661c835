"""Diagnose per-pose eval PSNR outliers (VERDICT r3: the 16.0-PSNR pose).

Renders every test pose from a trained checkpoint and decomposes the error:
  * per-pose PSNR (the render CLI's number), plus PSNR split into OBJECT
    pixels (GT non-white) and BACKGROUND pixels (GT white) — a floater the
    training views never see shows up as background error; a mis-fit object
    as object error;
  * error heatmap PNGs (|pred - gt| max over channels) next to pred/gt;
  * the worst 16x16 error patch location per pose.

    python -m tools.pose_diagnosis --dataset_root DATA --dataset_name NAME \
        [-t] [-w] [--img_scale 1.0] [--split test] [--poses 0,3,4]

``--split train --poses i,j`` renders TRAINING views from the same
checkpoint — comparing a weak test pose against its azimuth-adjacent train
views separates scene difficulty (both weak) from view overfitting (train
strong, test weak).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import jax

from nerf_tpu.cli.flags import config_from_args, finalize_config, get_parser
from nerf_tpu.cli.render import _strip_replica_axis, load_trained_params
from nerf_tpu.data.blender import BlenderDataset
from nerf_tpu.train.pipeline import init_variables
from nerf_tpu.train.renderer import render_image
from nerf_tpu.utils import save_image_grid


def psnr(mse):
    return -10.0 * np.log10(max(float(mse), 1e-12))


def main():
    parser = get_parser()
    parser.add_argument("--split", default="test", choices=["test", "train"])
    parser.add_argument("--poses", default="",
                        help="comma-separated pose indices (default: all)")
    args = parser.parse_args()
    cfg = config_from_args(args)
    root = os.path.join(args.dataset_root, args.dataset_name)
    testset = BlenderDataset.load(root, args.split, img_scale=args.img_scale,
                                  scene_scale=args.scene_scale,
                                  white_bkg=args.white_bkg)
    focal = testset.focal(legacy_square=args.legacy_focal)
    cfg = finalize_config(cfg, focal)
    template = init_variables(cfg, jax.random.PRNGKey(0))
    params = _strip_replica_axis(load_trained_params(args), template)

    out_dir = os.path.join(args.output_dir, "diagnosis")
    os.makedirs(out_dir, exist_ok=True)

    indices = (sorted(int(s) for s in args.poses.split(","))
               if args.poses else range(len(testset.poses)))
    for i in indices:
        pose = testset.poses[i]
        out = render_image(
            params, pose, testset.image_hw, focal, cfg,
            sample_num=cfg.n_fine,
            key=jax.random.fold_in(jax.random.PRNGKey(args.seed), i),
            chunk=args.eval_chunk)
        gt = testset.images[i]
        pred = out["rgb"]
        err2 = (pred - gt) ** 2
        obj = gt.min(axis=-1) < 0.95          # GT non-white = object
        p_all = psnr(err2.mean())
        p_obj = psnr(err2[obj].mean()) if obj.any() else float("nan")
        p_bkg = psnr(err2[~obj].mean()) if (~obj).any() else float("nan")

        amax = np.abs(pred - gt).max(axis=-1)
        # worst 16x16 patch (integral image)
        k = 16
        ii = np.cumsum(np.cumsum(amax, 0), 1)
        ii = np.pad(ii, ((1, 0), (1, 0)))
        patch = ii[k:, k:] - ii[:-k, k:] - ii[k:, :-k] + ii[:-k, :-k]
        r, c = np.unravel_index(np.argmax(patch), patch.shape)
        print(f"pose {i}: PSNR {p_all:6.2f}  object {p_obj:6.2f}  "
              f"background {p_bkg:6.2f}  obj_frac {obj.mean():.3f}  "
              f"worst16x16 at (row {r}, col {c}) sum {patch[r, c]:.1f}")
        heat = np.repeat((amax / max(amax.max(), 1e-6))[..., None], 3, -1)
        save_image_grid(os.path.join(out_dir, f"{args.split}_pose_{i}.png"),
                        [pred, gt, heat], nrow=3)
    print(f"maps -> {out_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
