"""Trajectory-parity race: the reference's own torch step vs nerf_tpu.

Runs the reference's ACTUAL train-step composition — its ProposalNetwork /
MipNeRF / RefNeRF modules, get_weights, maxBlurFilter, inverseSample,
length2pts / coarseFineMerge, NeRF.render, getBounds, ProposalLoss, MSE,
torch Adam + DecayLrScheduler, assembled exactly as train.py:164-222 —
against nerf_tpu's `compute_loss` + optax step, from a COMMON imported init
and IDENTICAL per-step randomness, and returns both loss/PSNR trajectories.

This pins what component tests can't: the composition (loss assembly
train.py:195-198, actual_lr = lr*rays/512 train.py:56, softplus(x+0.5)
train.py:181, Adam/schedule semantics) as one trajectory.

Randomness injection:
  * ray batches + rgb targets are drawn host-side (numpy) and fed to both;
  * stratified jitter is drawn host-side; torch gets lengths built by the
    validSampler formula (utils.py:87-90), jax gets the same jitter through
    render_rays_train(noise=...);
  * the inverse-CDF uniforms torch draws INSIDE sample_pdf (utils.py:115)
    are injected by monkeypatching torch.rand; jax receives the same draws
    pre-sorted (inverse_sample consumes sorted uniforms — the reference
    sorts after drawing, utils.py:41-43, same realization either way).

LR-sequence quirk mirrored here: the reference runs step 0 at the FULL
constructor lr and step k at sched(k-1) — update_opt_lr runs AFTER opt.step()
(train.py:218-222).  optax applies schedule(k) at step k, so the jax side
wraps its schedule with that shift.  nerf_tpu's own trainer keeps the
unshifted schedule(k): one step of lr lag during warmup (<=0.2% for one ramp
step), identical thereafter; the race is run with warmup_step=0.

Run standalone:  python -m tools.trajectory_race --steps 100 --model vanilla
"""

from __future__ import annotations

import contextlib
import math
import os
import sys

import numpy as np

REFERENCE = "/root/reference"
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)


@contextlib.contextmanager
def cpu_compat(torch):
    """Reference code on CPU: stub Tensor.cuda and np.math (numpy>=1.25)."""
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    np.math = math
    try:
        yield
    finally:
        torch.Tensor.cuda = orig_cuda
        del np.math


@contextlib.contextmanager
def injected_rand(torch, queue):
    """Replace torch.rand with a pop-from-queue stub (shape-checked)."""
    orig = torch.rand

    def fake_rand(*shape, **kw):
        if shape and isinstance(shape[0], (list, tuple)):
            shape = tuple(shape[0])
        arr = queue.pop(0)
        assert tuple(arr.shape) == tuple(shape), (
            f"injected rand shape {arr.shape} != requested {shape}")
        return torch.from_numpy(arr)

    torch.rand = fake_rand
    try:
        yield
    finally:
        torch.rand = orig


def make_ray_batches(steps, ray_num, hw, seed):
    """Shared (rays, rgb_gt) per step from a synthetic scene, host-side."""
    import jax
    import jax.numpy as jnp

    from nerf_tpu.core import rays as rays_lib
    from nerf_tpu.data.synthetic import make_synthetic_scene

    train, _, _ = make_synthetic_scene(n_train=3, n_test=1, hw=hw, seed=0,
                                       n_samples=32)
    pool = np.asarray(train.pixel_pool())  # (N, H*W, 3)
    poses = np.asarray(train.poses)        # (N, 3, 4)
    h, w = hw
    rng = np.random.default_rng(seed)
    batches = []
    for s in range(steps):
        img = int(rng.integers(0, len(pool)))
        pix = rng.integers(0, h * w, size=ray_num)
        rgb_gt = pool[img][pix]
        row, col = pix // w, pix % w
        coords = np.stack((col - w // 2, h // 2 - row), axis=-1)
        rays = np.asarray(rays_lib.rays_from_coords(
            jnp.asarray(coords), jnp.asarray(poses[img]),
            (float(train.focal()[0]), float(train.focal()[1]))))
        batches.append((rays.astype(np.float32), rgb_gt.astype(np.float32)))
    return batches


def run_race(model: str = "vanilla", steps: int = 50, ray_num: int = 64,
             n_coarse: int = 24, n_fine: int = 32, width: int = 48,
             prop_width: int = 48, lr: float = 1.5e-4, seed: int = 0,
             hw=(40, 40), prop_normal: bool = False):
    """Race the two frameworks; returns dict with per-step trajectories."""
    import torch
    import torch.nn.functional as F

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from import_torch_checkpoint import (
        prop_params_from_torch, refnerf_params_from_torch,
        vanilla_params_from_torch,
    )

    from nerf_tpu.train import losses as jl
    from nerf_tpu.train import schedule as schedule_lib
    from nerf_tpu.train.config import PipelineConfig
    from nerf_tpu.train.pipeline import make_models
    from nerf_tpu.train.step import compute_loss, make_optimizer

    if model == "ref":
        # the reference's RefNeRF silently requires hidden_unit == output_dim
        # (ref_model.py:55-59: the dir_block2 tail is makeMLP(hidden, out),
        # makeMLP(hidden, out) — the second expects ``hidden`` inputs but
        # receives ``out``); output_dim is not a constructor arg, so the race
        # must run at the default 256
        width = 256

    with cpu_compat(torch):
        from nerf.addtional import (
            ProposalLoss, ProposalNetwork as TorchProp, getBounds,
        )
        from nerf.mip_methods import maxBlurFilter
        from nerf.nerf_base import DecayLrScheduler, NeRF
        from nerf.utils import inverseSample

        torch.manual_seed(seed + 31)
        if model == "ref":
            from nerf.ref_model import (
                BackFaceLoss, RefNeRF as TorchRef, WeightedNormalLoss,
            )

            # bottle_neck_noise=0: zero on both sides (the one draw that
            # cannot be shared across frameworks without patching randn)
            t_net = TorchRef(10, 4, hidden_unit=width,
                             perturb_bottle_neck_w=0.0)
            normal_loss_func = WeightedNormalLoss(True)
            bf_loss_func = BackFaceLoss()
        else:
            from nerf.mip_model import MipNeRF as TorchMip

            t_net = TorchMip(10, 4, hidden_unit=width)
        t_prop = TorchProp(10, hidden_unit=prop_width)

    # common init: the torch init imported into flax (parity-tested mapping)
    nerf_from_torch = (refnerf_params_from_torch if model == "ref"
                       else vanilla_params_from_torch)
    j_params = {
        "nerf": nerf_from_torch(
            {k: v.detach().numpy() for k, v in t_net.state_dict().items()}),
        "prop": prop_params_from_torch(
            {k: v.detach().numpy() for k, v in t_prop.state_dict().items()}),
    }
    j_params = jax.tree.map(jnp.asarray, j_params)

    if prop_normal and model != "ref":
        raise ValueError("--prop_normal races only the ref composition "
                         "(train.py:183-187)")
    cfg = PipelineConfig(
        model=model, ray_batch=ray_num, n_coarse=n_coarse, n_fine=n_fine,
        nerf_width=width, prop_width=prop_width, use_bf16=False,
        use_pallas=False, bottleneck_noise=0.0, prop_normal=prop_normal,
        # racing the reference's ACTUAL coarse_grad_select requires its
        # off-by-one behavior (ref_model.py:108-117); the corrected default
        # mapping deliberately diverges (documented in train/config.py)
        legacy_coarse_select=prop_normal)

    actual_lr = schedule_lib.scaled_base_lr(lr, ray_num)
    warmup = 0
    sched = schedule_lib.decay_schedule(actual_lr, min_ratio=0.1,
                                        decay_rate=0.1, decay_step=100_000,
                                        warmup_step=warmup)

    # mirror the reference's post-step lr update: step 0 at full lr,
    # step k at sched(k-1)
    def shifted_sched(k):
        return jnp.where(k == 0, actual_lr, sched(jnp.maximum(k - 1, 0)))

    tx = make_optimizer(cfg, shifted_sched)
    opt_state = tx.init(j_params)
    models = make_models(cfg)

    t_opt = torch.optim.Adam(
        list(t_net.parameters()) + list(t_prop.parameters()),
        lr=actual_lr, betas=(0.9, 0.999))
    lr_sch = DecayLrScheduler(0.1, 0.1, 100_000, actual_lr, warmup)

    import optax

    @jax.jit
    def j_step(params, opt_state, rays, rgb_gt, jitter, u):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: compute_loss(models, p, rays, rgb_gt,
                                   jax.random.PRNGKey(0), cfg,
                                   noise=(jitter, u)),
            has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, metrics

    def t_step(rays_np, rgb_np, jitter_np, u_np):
        """The reference run() composition, train.py:164-218 (CPU)."""
        rays = torch.from_numpy(rays_np)
        rgb_targets = torch.from_numpy(rgb_np)
        jitter = torch.from_numpy(jitter_np)
        res = (cfg.far - cfg.near) / n_coarse
        all_lengths = torch.linspace(cfg.near, cfg.far - res, n_coarse)
        coarse_lengths = all_lengths + jitter * res  # utils.py:87-89
        coarse_samples = rays[:, None, :3] \
            + rays[:, None, 3:] * coarse_lengths[:, :, None]

        with cpu_compat(torch), injected_rand(torch, [u_np]):
            coarse_samples.requires_grad = prop_normal  # train.py:165
            density = t_prop.forward(coarse_samples)
            coarse_grad = None
            if prop_normal:
                from nerf.ref_model import RefNeRF as TorchRefCls

                coarse_grad = -TorchRefCls.get_grad(density, coarse_samples)
            density = F.softplus(density)
            prop_weights_raw = TorchProp.get_weights(
                density, coarse_lengths, rays[:, 3:])
            prop_weights = maxBlurFilter(prop_weights_raw, 0.01)
            fine_lengths, below_idxs = inverseSample(
                prop_weights, coarse_lengths, n_fine + 1, sort=True)
            normal_loss = bf_loss = coarse_normal_loss = 0.0
            if model == "ref":
                fine_samples, fine_lengths, below_idxs, sort_ids = \
                    NeRF.coarseFineMerge(rays, coarse_lengths, fine_lengths,
                                         below_idxs)
                fine_pos, fine_dir = fine_samples.split((3, 3), dim=-1)
                fine_pos.requires_grad = True
                fine_rgbo, pred_normal = t_net.forward(fine_pos, fine_dir)
                density_grad = -TorchRef.get_grad(fine_rgbo[..., -1],
                                                  fine_pos)
                fine_rgbo = torch.cat(
                    [fine_rgbo[..., :-1],
                     F.softplus(fine_rgbo[..., -1:] + 0.5)], dim=-1)
                fine_rendered, weights, _ = NeRF.render(
                    fine_rgbo, fine_lengths, rays[:, 3:],
                    density_act=t_net.density_act)
                normal_loss = normal_loss_func(weights, density_grad,
                                               pred_normal)
                bf_loss = bf_loss_func(weights, pred_normal, fine_dir)
                if prop_normal:  # train.py:185-187
                    from nerf.ref_model import RefNeRF as TorchRefCls

                    coarse_pt_fine_grad = TorchRefCls.coarse_grad_select(
                        density_grad, sort_ids, n_coarse)
                    coarse_normal_loss = normal_loss_func(
                        prop_weights, coarse_pt_fine_grad.detach(),
                        coarse_grad)
            else:
                fine_lengths = fine_lengths[..., :-1]
                fine_samples = NeRF.length2pts(rays, fine_lengths)
                fine_rgbo = t_net.forward(fine_samples)
                fine_rendered, weights, _ = NeRF.render(
                    fine_rgbo, fine_lengths, rays[:, 3:])
            weight_bounds = getBounds(prop_weights, below_idxs)
            t_opt.zero_grad()
            img_loss = torch.nn.MSELoss()(fine_rendered, rgb_targets)
            prop_loss = ProposalLoss()(weight_bounds, weights.detach())
            loss = prop_loss + img_loss \
                + 4e-4 * (normal_loss + 0.1 * coarse_normal_loss) \
                + 0.1 * bf_loss  # train.py:198
            loss.backward()
            t_opt.step()
        return float(loss.item()), float(img_loss.item())

    batches = make_ray_batches(steps, ray_num, hw, seed)
    rng = np.random.default_rng(seed + 1)

    traj = {"torch_loss": [], "jax_loss": [], "torch_psnr": [],
            "jax_psnr": [], "torch_img": [], "jax_img": []}
    train_cnt = 0
    for rays_np, rgb_np in batches:
        jitter_np = rng.random((ray_num, n_coarse), dtype=np.float32)
        u_np = rng.random((ray_num, n_fine + 1), dtype=np.float32)

        t_loss, t_img = t_step(rays_np, rgb_np, jitter_np, u_np)
        _, lr_now = lr_sch.update_opt_lr(train_cnt, t_opt)  # train.py:222
        train_cnt += 1

        j_params, opt_state, m = j_step(
            j_params, opt_state, jnp.asarray(rays_np), jnp.asarray(rgb_np),
            jnp.asarray(jitter_np), jnp.asarray(np.sort(u_np, axis=-1)))

        traj["torch_loss"].append(t_loss)
        traj["jax_loss"].append(float(m["loss"]))
        traj["torch_img"].append(t_img)
        traj["jax_img"].append(float(m["img_loss"]))
        traj["torch_psnr"].append(-10.0 * math.log10(max(t_img, 1e-12)))
        traj["jax_psnr"].append(float(m["psnr"]))
    return {k: np.asarray(v) for k, v in traj.items()}


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vanilla", choices=["vanilla", "ref"])
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--prop_normal", default=False, action="store_true",
                    help="race the coarse-normal-loss composition "
                         "(train.py:183-187 incl. coarse_grad_select; jax "
                         "side runs with legacy_coarse_select=True)")
    args = ap.parse_args()
    traj = run_race(model=args.model, steps=args.steps,
                    prop_normal=args.prop_normal)
    tl, jl_ = traj["torch_loss"], traj["jax_loss"]
    rel = np.abs(tl - jl_) / (np.abs(tl) + 1e-9)
    print(f"{'step':>5s} {'torch_loss':>12s} {'jax_loss':>12s} {'rel':>9s} "
          f"{'torch_psnr':>11s} {'jax_psnr':>9s}")
    for i in range(len(tl)):
        print(f"{i:5d} {tl[i]:12.6f} {jl_[i]:12.6f} {rel[i]:9.2e} "
              f"{traj['torch_psnr'][i]:11.3f} {traj['jax_psnr'][i]:9.3f}")
    print(f"\nmax rel loss diff: {rel.max():.3e}  "
          f"final PSNR torch {traj['torch_psnr'][-1]:.3f} "
          f"vs jax {traj['jax_psnr'][-1]:.3f}")


if __name__ == "__main__":
    main()
