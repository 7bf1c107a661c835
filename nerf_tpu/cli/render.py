"""Render-only mode (-r): orbit video frames or test-pose evaluation.

Capability parity (behavior, not code) with render_only
(/root/reference/nerf/procedures.py:99-164):
  * loads the trained model (./model/<name>.ckpt, falling back to the newest
    rotating checkpoint);
  * renders either a 120-pose spherical orbit (default) or the test-set poses
    (-e), the latter with per-frame MSE + PSNR against ground truth
    (the reference's "SoftL1Loss" is plain MSE, addtional.py:38-43);
  * writes output/{sphere|given}/result_%03d.png grids with
    nrow = 1 + render_depth + render_normal (+ gt panel under -e).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax

from nerf_tpu.cli.flags import config_from_args
from nerf_tpu.core.rays import orbit_poses
from nerf_tpu.data.blender import BlenderDataset
from nerf_tpu.train.pipeline import init_variables
from nerf_tpu.train.renderer import render_image
from nerf_tpu.utils import CheckpointManager, load_checkpoint, save_image_grid
from nerf_tpu.utils.image import to_uint8


def load_trained_params(args):
    """./model/<name>.ckpt if present, else newest rotating checkpoint.

    Returns raw nested dicts; callers reconcile against their param template
    (see _strip_replica_axis)."""
    final = os.path.join("model", f"{args.name}.ckpt")
    if os.path.exists(final):
        state, step, epoch = load_checkpoint(final, target=None)
        print(f"Loaded {final} (step {step}, epoch {epoch})")
        return state["params"] if "params" in state else state
    mgr = CheckpointManager(os.path.join(args.ckpt_dir, args.dataset_name),
                            max_save=args.max_save,
                            prefix=f"{args.name}_chkpt")
    restored = mgr.restore(target=None)
    if restored is None:
        raise FileNotFoundError(
            f"no trained model at {final} and no checkpoint under "
            f"{mgr.directory}")
    state, step, epoch = restored
    print(f"Loaded {mgr.latest_path()} (step {step}, epoch {epoch})")
    return state["params"] if "params" in state else state


def _strip_replica_axis(params, template):
    """Drop a leading replica axis left by distributed training, if present."""
    import jax.numpy as jnp

    def fix(p, t):
        p = jnp.asarray(p)
        if p.ndim == t.ndim + 1:
            return p[0]
        return p

    return jax.tree.map(fix, params, template,
                        is_leaf=lambda x: not isinstance(x, dict))


def render_only(args, scene_scale_override: Optional[float] = None):
    cfg = config_from_args(args)
    root = os.path.join(args.dataset_root, args.dataset_name)
    testset = BlenderDataset.load(root, "test", img_scale=args.img_scale,
                                  scene_scale=args.scene_scale,
                                  white_bkg=args.white_bkg)
    hw = testset.image_hw
    # honor --legacy_focal like the trainer does (cli/trainer.py) so a model
    # trained under the quirk is evaluated with the same focal length
    focal = testset.focal(legacy_square=getattr(args, "legacy_focal", False))
    from nerf_tpu.cli.flags import finalize_config

    cfg = finalize_config(cfg, focal)

    template = init_variables(cfg, jax.random.PRNGKey(0))
    params = load_trained_params(args)
    params = _strip_replica_axis(params, template)

    if args.eval_poses:
        poses = testset.poses
        out_dir = os.path.join(args.output_dir, "given")
    else:
        poses = orbit_poses(120, phi_deg=-30.0, radius=4.0)[:, :3, :]
        poses = poses.copy()
        poses[:, :, 3] *= (scene_scale_override or args.scene_scale)
        out_dir = os.path.join(args.output_dir, "sphere")
    os.makedirs(out_dir, exist_ok=True)

    psnrs, frames = [], []
    for i, pose in enumerate(poses):
        out = render_image(
            params, pose, hw, focal, cfg, sample_num=cfg.n_fine,
            render_depth=args.render_depth, render_normal=args.render_normal,
            key=jax.random.fold_in(jax.random.PRNGKey(args.seed), i),
            chunk=args.eval_chunk)
        panels = [out["rgb"]]
        if "normal" in out:
            panels.append(out["normal"])
        if "depth" in out:
            d = out["depth"]
            panels.append(d / max(float(d.max()), 1e-8))
        if args.eval_poses:
            gt = testset.images[i]
            mse = float(np.mean((out["rgb"] - gt) ** 2))
            psnr = -10.0 * np.log10(max(mse, 1e-12))
            psnrs.append(psnr)
            print(f"Image loss:{mse:.6f}\tPSNR:{psnr:.4f}")
            panels.append(gt)
        nrow = len(panels)
        save_image_grid(os.path.join(out_dir, f"result_{i:03d}.png"),
                        panels, nrow=nrow)
        if not args.eval_poses:
            frames.append(to_uint8(out["rgb"]))
    if frames:
        # stitch the orbit into an animation (the reference leaves a bare
        # PNG sequence, README "spherical rendering")
        from PIL import Image

        gif = os.path.join(out_dir, "orbit.gif")
        imgs = [Image.fromarray(f) for f in frames]
        imgs[0].save(gif, save_all=True, append_images=imgs[1:], duration=50,
                     loop=0)
        print(f"Orbit animation -> {gif}")
    if psnrs:
        print(f"Mean PSNR over {len(psnrs)} test poses: {np.mean(psnrs):.4f}")
    print(f"Output completed -> {out_dir}")
    return np.mean(psnrs) if psnrs else None
