"""Analytic FLOPs model of the train step, for MFU reporting.

Counts matmul FLOPs only (2 x MAC over every Dense kernel) — the MLPs are
>95% of the model FLOPs; PE/IDE/composite are ignored, so the reported MFU
is slightly conservative.  Derived from the parameter pytree itself, so it
tracks any width/depth config without a parallel hand-maintained table.

Pass structure per train step (per point of the relevant sample axis):
  * proposal + vanilla fine nets: forward + backward = 3x forward
    (backward = data-grad + weight-grad matmuls, each ~1 forward).
  * Ref-NeRF spatial trunk: forward + density-gradient backward (data-grad
    only, ~1 forward; reference train.py:165-168) + loss backward (2x)
    = 4x forward.
  * Ref-NeRF directional branch: 3x forward.

Peak: TPU v5e ~197 TFLOP/s bf16 (public spec). Override with
``peak_flops`` for other chips.
"""

from __future__ import annotations

import jax

V5E_BF16_PEAK = 197e12


def _mac_per_point(params_subtree) -> int:
    """Sum of in*out over every 2-D kernel in the subtree (1 MAC each/pt)."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(params_subtree):
        if getattr(leaf, "ndim", 0) == 2:  # kernels are 2-D, biases 1-D
            total += int(leaf.shape[0]) * int(leaf.shape[1])
    return total


def train_step_flops(cfg, params) -> float:
    """Model matmul FLOPs for ONE train step at cfg's sample counts."""
    r = cfg.ray_batch
    nerf_p = params["nerf"]
    if cfg.model == "ref":
        spa_keys = ("spa_block1", "spa_block2", "rho_tau_head",
                    "norm_col_tint_head", "bottle_neck")
        dir_keys = ("dir_block1", "dir_block2", "spec_rgb_head")
        spa = sum(_mac_per_point(nerf_p[k]) for k in spa_keys)
        dr = sum(_mac_per_point(nerf_p[k]) for k in dir_keys)
        pts = r * cfg.n_merged  # merged coarse+fine samples
        fine_flops = 2.0 * pts * (4 * spa + 3 * dr)
    elif cfg.model == "mip":
        net = _mac_per_point(nerf_p)
        fine_flops = 2.0 * r * (cfg.n_coarse + cfg.n_fine) * 3 * net
    else:
        net = _mac_per_point(nerf_p)
        fine_flops = 2.0 * r * cfg.n_fine * 3 * net
    prop_flops = 0.0
    if "prop" in params:
        prop_flops = 2.0 * r * cfg.n_coarse * 3 * _mac_per_point(params["prop"])
    return fine_flops + prop_flops


def mfu(cfg, params, rays_per_sec: float,
        peak_flops: float = V5E_BF16_PEAK) -> float:
    """Model FLOPs utilization of a measured training throughput."""
    steps_per_sec = rays_per_sec / cfg.ray_batch
    return steps_per_sec * train_step_flops(cfg, params) / peak_flops
