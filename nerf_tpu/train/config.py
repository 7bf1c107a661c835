"""Static pipeline configuration (hashable; safe as a jit static argument).

Field defaults mirror the reference CLI defaults
(/root/reference/nerf/procedures.py:166-213).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional


@dataclass(frozen=True)
class PipelineConfig:
    model: str = "vanilla"            # "vanilla" | "ref" | "mip"
    # "mip" = true Mip-NeRF (ICCV 2021): ONE network queried at both levels
    # with conical-frustum IPE; the proposal net is removed and resampling
    # uses the coarse pass's own weights (the reference repo retains the
    # IPE math but never runs this mode, README.md:95)
    mip_coarse_loss_w: float = 0.1    # coarse-pass MSE weight (paper's 0.1)
    near: float = 2.0
    far: float = 6.0
    n_coarse: int = 64                # --coarse_sample_pnum
    n_fine: int = 128                 # --fine_sample_pnum
    ray_batch: int = 1024             # --sample_ray_num
    white_bkg: bool = False           # -w (eval composite only, matching train.py)
    use_srgb: bool = False            # -u
    prop_normal: bool = False         # --prop_normal
    ide_level: int = 4                # --ide_level
    bottleneck_noise: float = 0.02    # --bottle_neck_noise
    nerf_width: int = 256             # --nerf_net_width
    prop_width: int = 256             # --prop_net_width
    max_blur_alpha: float = 0.01      # hardcoded at train.py:171
    # loss coefficients (train.py:198)
    normal_loss_w: float = 4e-4
    coarse_normal_rel_w: float = 0.1
    backface_w: float = 0.1
    # optional regularizers (defined-but-unused / branch-only in the reference)
    distortion_w: float = 0.0         # addtional.py:26-36 Regularizer (dead code there)
    entropy_w: float = 0.0            # InfoNeRF ray-entropy (separate branch upstream)
    entropy_acc_threshold: float = 0.1
    # numerics
    use_bf16: bool = False            # TPU-native replacement for APEX AMP (-s)
    # Pallas fused-MLP kernels for the hot path (ops/fused_mlp.py); the
    # XLA/flax path remains the correctness oracle and the fallback wherever
    # input gradients are required (Ref-NeRF density normals).
    # None = auto: ON on TPU backends, OFF on CPU (tests would otherwise run
    # interpret-mode kernels everywhere).  Measured on v5e (tile=1024): the
    # whole-MLP fused kernels keep activations in VMEM, so rays/s stays flat
    # (~131k) from R=1024 to R=2^14 while the XLA path drops to ~119k beyond
    # R=4096 on its HBM-bound per-layer activation round trips.
    use_pallas: bool | None = None
    # Points per kernel grid step, both kernel families.  Round-5 on-chip
    # sweep (tools/batch_scaling --axis tile, residual-storing defaults):
    # 2048 beats 1024 everywhere measured — vanilla 192.8k -> 195.2k @R=1024
    # and 199.0k -> 200.5k @R=2^14, ref 70.1k -> 70.8k @R=1024 and 71.0k ->
    # 71.9k @R=4096 rays/s (fewer grid steps amortize residual-read DMA
    # issue better; fits under the 64 MB scoped-VMEM ceiling,
    # ops/fused_mlp._VMEM_LIMIT).  512 loses ~4%.
    pallas_tile: int = 2048
    # Mip-NeRF integrated positional encoding for the vanilla fine net.
    # The reference retains the IPE math but never calls it in forward
    # (README.md:95, mip_methods.py:36-58); here it is a live mode:
    # fine-sample boundaries become conical-frustum Gaussians and the MLP
    # sees attenuated frequency features. ipe_radius is the pixel base
    # radius (2/sqrt(12)/focal), set by the trainer from the dataset focal.
    use_ipe: bool = False
    ipe_radius: float = 0.0
    # (The --legacy_focal quirk, utils.py:103-105, lives at the dataset
    # focal() call sites in cli/trainer.py and cli/render.py, not here.)
    # The reference computes density-gradient normals with
    # torch.autograd.grad(create_graph=False) (ref_model.py:119-125,
    # train.py:165-168): the normal-loss TARGETS are detached constants and
    # no second-order gradient ever flows. Default reproduces that (and is
    # much faster); True differentiates through the density gradients
    # (true second-order, shapes the density field toward smooth normals).
    second_order_normals: bool = False
    # Ref-NeRF kernel strategy when use_pallas resolves True:
    #   "all"    — whole fine forward in two Pallas kernels
    #              (ops/ref_fused.py: spatial + directional-with-glue,
    #              row-land narrow ops; 49.4k vs XLA's 38.3k rays/s on v5e,
    #              round 3) — the default
    #   "hybrid" — Pallas spatial kernel + XLA directional branch (35.1k)
    ref_kernels: str = "all"
    # Vanilla/mip fine-kernel backward strategy: False = recompute-form
    # backward (re-runs the forward matmuls in-kernel), True = the forward
    # stores the 9 bf16 tile activations to HBM and the backward streams
    # them back.  Round 4 re-measured the A/B with a DCE-corrected harness
    # (tools/bench_vanilla_kernels — the earlier "recompute wins" number
    # had XLA dead-code-eliminating the forward custom call): true fwd+bwd
    # on v5e at tile=1024 is 4.37 ms residual vs 4.82 ms recompute.
    store_residuals: bool = True
    # Per-net override for the PROPOSAL kernel's backward strategy.  The
    # analytic roofline (tools/roofline.py) prices the prop residuals at
    # ~0.33 ms/step of HBM traffic vs ~0.14 ms of recompute matmuls — the
    # opposite sign of the fine net's trade — and the round-5 on-chip A/B
    # agrees (tools/batch_scaling --axis prop_res, R=1024: recompute 193.4k
    # vs residual 192.8k rays/s), so the prop kernel defaults to the
    # RECOMPUTE form while the fine kernel stores.  None = follow
    # store_residuals.
    prop_store_residuals: Optional[bool] = False
    # Pipeline buffer count for the BACKWARD kernels' grid-blocked inputs
    # (pl.Buffered on x/cotangent/residual streams).  None = Mosaic's
    # default double buffering.  Probe for the round-5 lever — the
    # residual-READING backwards measure at 91-100% of their no-overlap
    # compute+DMA bound (reads gate compute, BENCHMARKS.md round-5
    # breakdown).  CLOSED on this toolchain: Mosaic rejects
    # buffer_count > 2 at compile (tools/batch_scaling --axis bufs,
    # round-5 on-chip A/B), so deeper prefetch is unavailable; the knob
    # stays for a future Mosaic that lifts the cap.
    bwd_bufs: Optional[int] = None
    # Eval/render forward kernel selection.  None = the measured default
    # (XLA; the fused kernels' win is backward activation traffic, see
    # render_rays_eval).  True/False forces the eval path onto/off the
    # Pallas kernels — the A/B axis for tools/eval_ab.py.
    eval_use_pallas: Optional[bool] = None
    # Spatial-PE construction for the FUSED kernel paths: False = the
    # matmul+one-sin form (fastmath.positional_encoding_mm), True = the
    # row-land angle-doubling form (fastmath.cat_pos_pe — one (6, N)
    # transcendental pass + complex-squaring octaves + one bf16 relayout).
    # Only the kernel paths switch: they consume enc in bf16 under
    # stop_gradient, where the doubling error (~6e-5) is two decades below
    # quantization; the flax/XLA oracle keeps the exact form.
    pe_doubling: bool = False
    # The reference's coarse_grad_select (ref_model.py:108-117) is off by
    # one: its selector is built over the TRUNCATED length (192) instead of
    # the pre-truncation 193, so it treats the last FINE sample as coarse
    # and silently drops the real last coarse sample.  Default here is the
    # corrected mapping (exact merge-rank positions, dropped sample masked
    # out of the loss); True reproduces the reference's quirk bit-for-bit
    # (SURVEY section 7 policy: reproduce behind a flag, fix by default).
    legacy_coarse_select: bool = False

    @property
    def n_merged(self) -> int:
        """Ref-path sample count after coarse/fine merge minus the dropped tail."""
        return self.n_coarse + self.n_fine

    def replace(self, **kw) -> "PipelineConfig":
        return dataclasses.replace(self, **kw)
