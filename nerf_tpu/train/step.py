"""The jitted train step and epoch scan.

TPU-first redesign of the reference train loop (train.py:150-222):
  * the whole dataset lives in device HBM ((N, H*W, 3) pixel pool + (N, 3, 4)
    poses); per-step pixel picks, ray generation, rendering, loss, and the
    optimizer update are ONE compiled XLA program — zero host->device traffic
    per step (the reference copies an image to the GPU every step,
    train.py:153-154);
  * a whole epoch optionally runs as one lax.scan over the shuffled image
    order, amortizing dispatch overhead to nothing;
  * randomness is a threaded PRNG key folded with the step counter —
    bit-deterministic resume.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from nerf_tpu.core import rays as rays_lib
from nerf_tpu.train import losses
from nerf_tpu.train.config import PipelineConfig
from nerf_tpu.train.pipeline import render_rays_train


class TrainState(NamedTuple):
    params: Any        # {"nerf": ..., "prop": ...}
    opt_state: Any
    step: jnp.ndarray  # int32 scalar — the reference's train_cnt


def create_train_state(params, tx) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def sample_train_rays(key, pixel_pool, poses, img_idx, hw, focal, ray_num: int,
                      crop_window: Optional[Tuple[int, int, int, int]] = None):
    """Pick ``ray_num`` random pixels of image ``img_idx`` and build rays.

    pixel_pool: (N, H*W, 3); poses: (N, 3, 4).  Behavior parity with
    randomFromOneImage + validSampler (utils.py:47-94): uniform pixel picks
    with replacement, optionally restricted to a static center-crop window.
    Returns (rays (ray_num, 6), rgb_gt (ray_num, 3)).
    """
    h, w = hw
    x_lb, x_ub, y_lb, y_ub = crop_window if crop_window else (0, w, 0, h)
    k_row, k_col = jax.random.split(key)
    row = jax.random.randint(k_row, (ray_num,), y_lb, y_ub)
    col = jax.random.randint(k_col, (ray_num,), x_lb, x_ub)
    pix = row * w + col
    # one flat gather with global indices — pixel_pool[img_idx][pix] first
    # materializes a layout copy of the whole selected image (~0.23 ms/step
    # on a v5e at 400x400)
    flat = pixel_pool.reshape(-1, 3)
    rgb_gt = flat[img_idx * (h * w) + pix]
    coords = jnp.stack((col - w // 2, h // 2 - row), axis=-1)
    rays = rays_lib.rays_from_coords(coords, poses[img_idx], focal)
    return rays, rgb_gt


def legacy_coarse_positions(coarse_pos: jnp.ndarray,
                            last_fine_pos: jnp.ndarray) -> jnp.ndarray:
    """Merged positions the reference's coarse_grad_select actually reads.

    Reference-quirk parity (ref_model.py:108-117): the boolean selector is
    built over the TRUNCATED merge length, so it marks pre-sort indices
    [n_kept - C, n_kept) as "coarse" — the last FINE sample plus coarse
    samples 0..C-2 — and pairs them, in merged (sorted-z) order, with the C
    coarse samples.  Rebuild that pairing from the merge ranks: insert the
    last fine sample's position into the (sorted) positions of coarse 0..C-2.

    coarse_pos: (R, C) merged positions of the coarse samples (sorted;
    position C+F-1 marks the dropped largest coarse sample).
    last_fine_pos: (R,) merged position of the last fine sample.
    Returns (R, C) int32 positions into the kept merged axis.
    """
    n_c = coarse_pos.shape[1]
    rc = coarse_pos[:, : n_c - 1]                   # (R, C-1), sorted
    t = last_fine_pos[:, None].astype(jnp.int32)    # (R, 1)
    m = jnp.sum((rc < t).astype(jnp.int32), axis=1, keepdims=True)
    k = jnp.arange(n_c, dtype=jnp.int32)[None, :]
    shift = jnp.clip(jnp.where(k < m, k, k - 1), 0, max(n_c - 2, 0))
    return jnp.where(k == m, t, jnp.take_along_axis(rc, shift, axis=1))


def compute_loss(models, params, rays, rgb_gt, key, cfg: PipelineConfig,
                 noise=None):
    """Total loss + metrics for one ray batch (train.py:193-198 parity).

    ``noise`` passes through to render_rays_train — pre-drawn (jitter, u)
    for the trajectory-parity harness."""
    # -b flag mode: discard stale flag tracers a FOREIGN trace (jitted eval
    # chunks, a dropped epoch-fn retrace) left in the sink — merging them
    # here would raise UnexpectedTracerError (see debug.reset_nan_flags)
    from nerf_tpu.utils import debug as debug_lib

    debug_lib.reset_nan_flags()
    out = render_rays_train(models, params, rays, key, cfg, noise=noise)
    img_loss = losses.mse(out["fine_rgb"], rgb_gt)
    if cfg.model == "mip":
        # Mip-NeRF: no proposal net; the coarse pass of the shared network
        # carries its own (down-weighted) reconstruction loss
        coarse_loss = losses.mse(out["coarse_rgb"], rgb_gt)
        loss = img_loss + cfg.mip_coarse_loss_w * coarse_loss
        metrics = {"img_loss": img_loss, "coarse_loss": coarse_loss,
                   "psnr": losses.mse_to_psnr(img_loss)}
    else:
        prop_loss = losses.proposal_loss(
            out["bounds"], jax.lax.stop_gradient(out["weights"])
        )
        loss = prop_loss + img_loss
        metrics = {"img_loss": img_loss, "prop_loss": prop_loss,
                   "psnr": losses.mse_to_psnr(img_loss)}

    if cfg.model == "ref":
        # pred_normal/density_grad arrive ROW-LAND (3, R, P) and fine_dirs
        # per-ray (R, 3) — see _ref_fine_forward's contract note
        normal_loss = losses.weighted_normal_loss_rl(
            out["weights"], out["density_grad"], out["pred_normal"],
            size_average=True
        )
        bf_loss = losses.backface_loss_rl(
            out["weights"], out["pred_normal"], out["fine_dirs"]
        )
        coarse_normal_loss = 0.0
        if cfg.prop_normal:
            # fine-merged density gradients gathered back to the coarse
            # sample positions.  The reference's boolean-mask gather
            # (ref_model.py:108-117) is off by one (it treats the last fine
            # sample as coarse and drops a real coarse sample); by default the
            # merge ranks give the exact positions, with the dropped largest
            # coarse sample masked out of the loss.
            n_kept = out["density_grad"].shape[2]
            cp = out["coarse_pos"]
            if cfg.legacy_coarse_select:
                # precondition: the dropped merged sample is the LAST coarse
                # one, i.e. f_z[:,-1] < c_z[:,-1].  A tie at the far plane
                # would put last_fine_pos == n_kept (the torch reference's
                # boolean selector misaligns identically there,
                # ref_model.py:108-117); clamp explicitly instead of leaning
                # on take_along_axis's implicit clip mode.
                lfp = jnp.minimum(out["last_fine_pos"], n_kept - 1)
                q = legacy_coarse_positions(cp, lfp)
                tgt3 = jnp.take_along_axis(
                    out["density_grad"], q[None, :, :], axis=2)
                valid = 1.0
            else:
                valid = (cp < n_kept).astype(jnp.float32)
                cp_safe = jnp.minimum(cp, n_kept - 1)
                tgt3 = jnp.take_along_axis(
                    out["density_grad"], cp_safe[None, :, :], axis=2)
            coarse_normal_loss = losses.weighted_normal_loss_rl(
                out["prop_weights"] * valid, jax.lax.stop_gradient(tgt3),
                jnp.moveaxis(out["coarse_grad"], -1, 0), size_average=True,
            )
        loss = loss + cfg.normal_loss_w * (
            normal_loss + cfg.coarse_normal_rel_w * coarse_normal_loss
        ) + cfg.backface_w * bf_loss
        metrics["normal_loss"] = normal_loss
        metrics["bf_loss"] = bf_loss

    if cfg.distortion_w > 0.0:
        z = out["z_merged"] if "z_merged" in out else out["z_fine"]
        loss = loss + cfg.distortion_w * losses.reference_distortion_loss(
            out["weights"], z
        )
    if cfg.entropy_w > 0.0:
        loss = loss + cfg.entropy_w * losses.ray_entropy_loss(
            out["weights"], cfg.entropy_acc_threshold
        )

    metrics["loss"] = loss
    # -b flag-mode attribution (axon: no host callbacks): drain any armed
    # per-module finite flags into the aux metrics INSIDE the grad trace
    metrics = debug_lib.attach_nan_flags(metrics)
    return loss, metrics


def make_train_step(models, tx, cfg: PipelineConfig, hw, focal,
                    crop_window=None, base_key=None, donate: bool = True):
    """Build the jitted single-image train step.

    Signature of the returned fn: (state, pixel_pool, poses, img_idx) ->
    (state, metrics).  The PRNG is derived by folding the step counter into
    ``base_key``.
    """
    base_key = jax.random.PRNGKey(0) if base_key is None else base_key

    def step_fn(state: TrainState, pixel_pool, poses, img_idx):
        key = jax.random.fold_in(base_key, state.step)
        k_pix, k_render = jax.random.split(key)
        rays, rgb_gt = sample_train_rays(
            k_pix, pixel_pool, poses, img_idx, hw, focal, cfg.ray_batch, crop_window
        )
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: compute_loss(models, p, rays, rgb_gt, k_render, cfg),
            has_aux=True,
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_epoch_step(models, tx, cfg: PipelineConfig, hw, focal,
                    crop_window=None, base_key=None, donate: bool = True):
    """Build a jitted whole-epoch scan: (state, pool, poses, img_order) ->
    (state, stacked metrics).  ``img_order`` is the shuffled (N,) int32 image
    visit order for the epoch.  ``donate=False`` keeps the input state alive
    (the CLI trainer needs it valid for signal-time checkpoints)."""
    base_key = jax.random.PRNGKey(0) if base_key is None else base_key

    def step_fn(carry, img_idx, pixel_pool, poses):
        state = carry
        key = jax.random.fold_in(base_key, state.step)
        k_pix, k_render = jax.random.split(key)
        rays, rgb_gt = sample_train_rays(
            k_pix, pixel_pool, poses, img_idx, hw, focal, cfg.ray_batch, crop_window
        )
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: compute_loss(models, p, rays, rgb_gt, k_render, cfg),
            has_aux=True,
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    def epoch_fn(state: TrainState, pixel_pool, poses, img_order):
        return jax.lax.scan(
            lambda c, i: step_fn(c, i, pixel_pool, poses), state, img_order
        )

    return jax.jit(epoch_fn, donate_argnums=(0,) if donate else ())


def make_optimizer(cfg: PipelineConfig, schedule, grad_clip: float = -1.0):
    """Adam(0.9, 0.999) + optional global-norm clipping (train.py:118-121)."""
    chain = []
    if grad_clip > 0.0:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(optax.adam(learning_rate=schedule, b1=0.9, b2=0.999))
    return optax.chain(*chain)
