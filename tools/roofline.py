"""Analytic kernel roofline for the fused train step (VERDICT r4 #6).

Answers "what is the hardware ceiling of the shipped (residual-storing)
backwards, and how close is the measured throughput?" — the question the
old BENCHMARKS.md MFU-convention note answered only for the RECOMPUTE form
(hardware FLOPs ~4x forward).  Under `store_residuals=True` (the default
since round 4) the backward streams stored bf16 activations from HBM
instead of re-running the forward, so the step has BOTH a lower compute
bound (hardware FLOPs ~= model FLOPs = 3x forward) and a new bandwidth
term (activation writes + reads).

The model counts, per fused kernel (fine / prop — and for Ref-NeRF the
spatial / directional pair):
  * MXU FLOPs: 2 x MAC through every dense layer, x{1 fwd, 2 bwd}
    (+1 more bwd recompute pass for the recompute form);
  * HBM bytes: kernel inputs (encodings, read by fwd AND bwd), outputs +
    their cotangents, and the residual tuple (written by fwd, read by bwd).
    Weights are grid-invariant Pallas blocks (fetched once per pass) and
    negligible next to the N-proportional streams.
plus the optimizer update (7 f32 streams over every param: grad read,
m/v read+write, param read+write).

Two bounds are printed: `max(t_mxu, t_hbm)` (perfect overlap — the true
roofline; Mosaic pipelines DMA against compute) and their sum (no overlap).
Everything OUTSIDE the kernels (PE, sampling, composite, losses) is real
step time the bound ignores — compare against a trace breakdown
(tools/trace_breakdown.py) to attribute the remainder.

Run: python -m tools.roofline [--model vanilla|ref|mip] [--rays_per_sec N]
(CPU is fine — nothing executes on the chip; params are only inspected.)
"""

from __future__ import annotations

import argparse
import sys

V5E_BF16_PEAK = 197e12   # FLOP/s, public v5e spec
V5E_HBM_BW = 819e9       # B/s, public v5e spec (16 GB @ 819 GB/s)


def _macs(tree):
    import jax
    return sum(int(l.shape[0]) * int(l.shape[1])
               for l in jax.tree_util.tree_leaves(tree)
               if getattr(l, "ndim", 0) == 2)


def _kernel(name, n_pts, macs_pt, in_widths, out_f32, res_widths, cd_bytes,
            store_residuals, extra_bwd_fwd_frac, in_f32_widths=()):
    """Cost model for one fused kernel (fwd + bwd over n_pts points).

    extra_bwd_fwd_frac: recompute-form backward re-runs this fraction of a
    forward in-kernel (1.0 for full recompute; the residual forms re-run
    only cheap pre-trunk glue, counted as 0 — it is measured ~free next to
    the trunk matmuls, BENCHMARKS.md round-4 --dissect_fwd).
    in_f32_widths: f32 kernel inputs (e.g. the ref heads crossing)."""
    fwd = 2.0 * n_pts * macs_pt
    bwd = 2.0 * fwd  # data-grad + weight-grad matmuls
    flops = fwd + bwd + (extra_bwd_fwd_frac * fwd if not store_residuals else 0.0)
    # bytes: inputs read by fwd + bwd; f32 outputs written by fwd, their
    # cotangents read by bwd; residuals written once + read once (cd)
    in_b = 2.0 * n_pts * (sum(in_widths) * cd_bytes
                          + sum(in_f32_widths) * 4.0)
    io_b = 2.0 * n_pts * out_f32 * 4.0
    res_b = (2.0 * n_pts * sum(res_widths) * cd_bytes
             if store_residuals else 0.0)
    return dict(name=name, flops=flops, bytes=in_b + io_b + res_b,
                res_bytes=res_b)


def kernel_costs(cfg, params, store_residuals):
    cd = 2 if cfg.use_bf16 else 4
    r = cfg.ray_batch
    ks = []
    if "prop" in params:
        w = cfg.prop_width
        ks.append(_kernel("prop", r * cfg.n_coarse, _macs(params["prop"]),
                          in_widths=(63,), out_f32=1,
                          res_widths=(w,) * 4, cd_bytes=cd,
                          store_residuals=store_residuals,
                          extra_bwd_fwd_frac=1.0))
    nerf_p = params["nerf"]
    if cfg.model == "ref":
        spa_keys = ("spa_block1", "spa_block2", "rho_tau_head",
                    "norm_col_tint_head", "bottle_neck")
        dir_keys = ("dir_block1", "dir_block2", "spec_rgb_head")
        spa = sum(_macs(nerf_p[k]) for k in spa_keys)
        dr = sum(_macs(nerf_p[k]) for k in dir_keys)
        pts = r * cfg.n_merged
        h = cfg.nerf_width
        # spatial: fwd + density-grad fwd-mode pass (~1 fwd) + loss bwd (2x)
        # = 4x fwd of MXU work regardless of strategy; residual form stores
        # 8 trunk activations (h1..z7 + inter).  The packed heads (139 f32/
        # pt, ops/ref_fused.py kernel contract) cross to the dir kernel and
        # their cotangent d(heads) crosses back: counted as spa out_f32
        # (write + cotangent read) + dir in_f32 (fwd + bwd reads).
        sk = _kernel("ref-spa", pts, spa, in_widths=(63, 128, 3),
                     out_f32=139 + 3 + 3 + 1,  # heads, normal, dgrad, density
                     res_widths=(h,) * 8, cd_bytes=cd,
                     store_residuals=store_residuals, extra_bwd_fwd_frac=1.0)
        sk["flops"] = 2.0 * pts * spa * 4.0 + (0.0 if store_residuals
                                               else 2.0 * pts * spa)
        ks.append(sk)
        # directional: heads + dirs in; rgb out; 8 stored trunk rows
        ks.append(_kernel("ref-dir", pts, dr,
                          in_widths=(3,), in_f32_widths=(139,),
                          out_f32=3,
                          res_widths=(h,) * 8, cd_bytes=cd,
                          store_residuals=store_residuals,
                          extra_bwd_fwd_frac=1.0))
    else:
        n_pts = r * (cfg.n_coarse + cfg.n_fine if cfg.model == "mip"
                     else cfg.n_fine)
        h, b = cfg.nerf_width, 256  # bottleneck (models/vanilla.py:25)
        rw = 128                    # rgb hidden width
        ks.append(_kernel("fine", n_pts, _macs(nerf_p),
                          in_widths=(63, 27), out_f32=3 + 1 + 3,
                          res_widths=(h,) * 6 + (b, b, rw), cd_bytes=cd,
                          store_residuals=store_residuals,
                          extra_bwd_fwd_frac=1.0))
    return ks


def report(cfg, params, rays_per_sec, store_residuals):
    import jax
    ks = kernel_costs(cfg, params, store_residuals)
    n_params = sum(l.size for l in jax.tree_util.tree_leaves(params))
    opt_bytes = 7.0 * n_params * 4.0
    tot_f = sum(k["flops"] for k in ks)
    tot_b = sum(k["bytes"] for k in ks) + opt_bytes
    t_mxu = tot_f / V5E_BF16_PEAK
    t_hbm = tot_b / V5E_HBM_BW
    form = "residual" if store_residuals else "recompute"
    print(f"\n[{cfg.model} / {form}]  R={cfg.ray_batch}")
    for k in ks:
        print(f"  {k['name']:8s} flops {k['flops']/1e9:7.2f} G   "
              f"bytes {k['bytes']/1e6:7.1f} MB"
              f"  (residuals {k['res_bytes']/1e6:6.1f} MB)")
    print(f"  optimizer                         bytes {opt_bytes/1e6:7.1f} MB")
    print(f"  t_mxu {t_mxu*1e3:6.3f} ms   t_hbm {t_hbm*1e3:6.3f} ms   "
          f"bound(max) {max(t_mxu, t_hbm)*1e3:6.3f} ms   "
          f"bound(sum) {(t_mxu+t_hbm)*1e3:6.3f} ms")
    for nm, bound in (("max", max(t_mxu, t_hbm)), ("sum", t_mxu + t_hbm)):
        ceil = cfg.ray_batch / bound
        print(f"  ceiling({nm}) {ceil:12,.0f} rays/s", end="")
        if rays_per_sec:
            print(f"   measured {rays_per_sec:12,.0f}  "
                  f"= {100.0*rays_per_sec/ceil:5.1f}% of ceiling")
        else:
            print()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vanilla",
                    choices=["vanilla", "ref", "mip"])
    ap.add_argument("--rays_per_sec", type=float, default=0.0)
    ap.add_argument("--ray_batch", type=int, default=1024)
    args = ap.parse_args()

    from nerf_tpu.train.config import PipelineConfig
    from nerf_tpu.train.pipeline import init_variables
    import jax

    cfg = PipelineConfig(ray_batch=args.ray_batch, n_coarse=64, n_fine=128,
                         nerf_width=256, prop_width=256, white_bkg=True,
                         use_bf16=True, model=args.model)
    params = init_variables(cfg, jax.random.PRNGKey(0))
    print(f"params: {sum(l.size for l in jax.tree_util.tree_leaves(params)):,}",
          file=sys.stderr)
    for sr in (True, False):
        report(cfg, params, args.rays_per_sec, sr)


if __name__ == "__main__":
    main()
