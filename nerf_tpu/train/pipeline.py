"""The shared render pipeline: proposal -> importance sampling -> fine model.

This is the TPU-native re-design of the reference's per-step closure
(train.py:164-199) and eval renderer (procedures.py:34-97): one pure function
over parameter pytrees with explicit PRNG keys, fully jittable, static shapes
throughout.  Both the train step and the eval renderer call into here so the
two paths cannot drift apart.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.core import fastmath
from nerf_tpu.core import rays as rays_lib
from nerf_tpu.core import render as render_lib
from nerf_tpu.core import sampling
from nerf_tpu.models import ProposalNetwork, RefNeRF, VanillaNeRF
from nerf_tpu.train.config import PipelineConfig


def make_models(cfg: PipelineConfig) -> Tuple[Any, ProposalNetwork]:
    dtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32
    if cfg.model == "mip":
        # true Mip-NeRF: ONE network at both levels; no proposal net
        nerf = VanillaNeRF(hidden=cfg.nerf_width, dtype=dtype)
        return nerf, None
    if cfg.model == "ref":
        # bf16 matmuls with fp32 islands: the density head, normal
        # normalization, composite, and every loss are fp32 (SURVEY.md
        # section 7); the second-order normal gradients tolerate bf16 trunk
        # matmuls (measured on v5e: same PSNR trajectory, +26% throughput)
        # just as the reference tolerated APEX O2 fp16 (README.md:137)
        nerf = RefNeRF(
            ide_level=cfg.ide_level,
            hidden=cfg.nerf_width,
            use_srgb=cfg.use_srgb,
            perturb_bottleneck=cfg.bottleneck_noise,
            dtype=dtype,
        )
    elif cfg.model == "vanilla":
        nerf = VanillaNeRF(hidden=cfg.nerf_width, dtype=dtype)
    else:
        raise ValueError(f"unknown model {cfg.model!r}")
    prop = ProposalNetwork(hidden=cfg.prop_width, dtype=dtype)
    return nerf, prop


def init_variables(cfg: PipelineConfig, key) -> Dict[str, Any]:
    nerf, prop = make_models(cfg)
    k1, k2, k3 = jax.random.split(key, 3)
    pos = jnp.zeros((1, 2, 3), jnp.float32)
    dirs = jnp.ones((1, 2, 3), jnp.float32)
    if cfg.model == "ref":
        nerf_vars = nerf.init({"params": k1, "noise": k3}, pos, dirs, True)
    else:
        nerf_vars = nerf.init(k1, pos, dirs)
    if prop is None:
        return {"nerf": nerf_vars["params"]}
    prop_vars = prop.init(k2, pos)
    return {"nerf": nerf_vars["params"], "prop": prop_vars["params"]}


# ---------------------------------------------------------------------------
# proposal stage (shared by train and eval)
# ---------------------------------------------------------------------------

def _fused_kernel_args(cfg: PipelineConfig):
    from nerf_tpu import ops

    dtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32
    return dtype, cfg.pallas_tile, not ops.pallas_supported()


def use_pallas(cfg: PipelineConfig) -> bool:
    """Resolve cfg.use_pallas=None (auto): fused kernels on real TPU backends,
    XLA path on CPU (where Pallas would run in slow interpret mode)."""
    if cfg.use_pallas is not None:
        return cfg.use_pallas
    from nerf_tpu import ops

    return ops.pallas_supported()


def _vanilla_inputs(nerf: VanillaNeRF, rays, f_z, cfg: PipelineConfig):
    """(pos, zvals, enc_x) for the vanilla fine net.

    PE mode: sample points at the f_z depths, model computes PE internally.
    IPE mode (cfg.use_ipe): the n_fine+1 sorted depths become n_fine conical
    frustums; the MLP sees the attenuated IPE feature of each frustum
    Gaussian and composites at the frustum centers mu_t.
    """
    from nerf_tpu.core.encoding import ipe_feature

    if not cfg.use_ipe:
        z_fine = f_z[..., :-1]
        return render_lib.lengths_to_points(rays, z_fine), z_fine, None
    feat, mu, mu_t = ipe_feature(f_z, rays, nerf.pos_levels, cfg.ipe_radius)
    enc_x = jnp.concatenate([mu, feat], axis=-1) if nerf.cat_origin else feat
    return mu, mu_t, enc_x


def _ray_dir_encoding(nerf: VanillaNeRF, dirs):
    """Per-ray [dirs_n, PE(dirs_n)] broadcast to the per-point shape.

    Valid whenever ``dirs`` is ``broadcast_to(rays[:, None, 3:], ...)`` —
    every pipeline call site.  Encoding at (R, 27) instead of (R*P, 27) and
    broadcasting the finished rows is bit-identical (same input bits per
    row) and removes the per-point dir PE complex (0.86 ms of the 7.18 ms
    vanilla step, round-3 trace — XLA cannot CSE identical rows it cannot
    prove identical).
    """
    from nerf_tpu.core.encoding import positional_encoding

    dirs_ray = dirs[:, 0, :]
    dirs_n = dirs_ray / jnp.linalg.norm(dirs_ray, axis=-1, keepdims=True)
    enc = positional_encoding(dirs_n, nerf.dir_levels)
    if nerf.cat_origin:
        enc = jnp.concatenate([dirs_n, enc], axis=-1)
    r, p = dirs.shape[:2]
    return jnp.broadcast_to(enc[:, None, :], (r, p, enc.shape[-1]))


def _apply_vanilla(nerf: VanillaNeRF, params, pos, dirs, cfg: PipelineConfig,
                   enc_x=None):
    """VanillaNeRF apply — fused Pallas kernel or the flax/XLA oracle.

    Returns (rgb3 (3, R, P) ROW-LAND, sigma (R, P)) — rgb crosses in the
    layout the row-land composite wants (the (R, P, 3) glue runs at 3/128
    lanes; see render_lib.composite_rl).  Eval transposes back per frame.

    The fused path is valid here because pos/dirs carry no gradient (sampled
    depths are detached, sampling.py:105; rays are data).  The same holds
    with enc_x given (IPE mode / mip): the IPE features are functions of
    DETACHED edges (render_rays_train stop_gradients the resampling weights,
    matching the reference's .detach() at utils.py:35-36) and of the rays,
    so the kernel's zero input cotangents are exact there too — routing the
    mip/IPE passes through the kernel took mip off the XLA per-layer
    activation round trips it was paying.
    """
    if not use_pallas(cfg):
        rgb, sigma = nerf.apply({"params": params}, pos, dirs, enc_x,
                                _ray_dir_encoding(nerf, dirs))
        return jnp.moveaxis(rgb, -1, 0), sigma
    from nerf_tpu import ops


    # the fused kernel's input cotangents are zero; stop_gradient makes the
    # (dead) encoding-transpose chain DCE-able instead of multiplying zeros.
    # The PE preamble deliberately stays OUTSIDE the kernel: an in-kernel
    # variant measured 119k vs 131k rays/s at R=1024 — the (T, 3) narrow
    # preamble ops lose more than the enc HBM round trip costs.
    pos = jax.lax.stop_gradient(pos)
    r, p = pos.shape[:2]
    cd = _fused_kernel_args(cfg)[0]
    if enc_x is None:
        pos_f = pos.reshape(r * p, 3)
        # cast to the kernel compute dtype AT construction so the convert
        # fuses into the sin fusion instead of a separate (N, 63) round trip
        enc_x = fastmath.cat_pos_pe(pos_f, nerf.pos_levels, cd,
                                    doubling=cfg.pe_doubling)
    else:
        enc_x = jax.lax.stop_gradient(enc_x).reshape(r * p, -1).astype(cd)
    # ray-level dir encoding broadcast over the P samples (see
    # _ray_dir_encoding); cast to the kernel compute dtype so the convert
    # fuses into the PE sin fusion
    enc_d = _ray_dir_encoding(
        nerf, jax.lax.stop_gradient(dirs)).astype(cd).reshape(r * p, -1)
    fused = ops.make_vanilla_fused(*_fused_kernel_args(cfg),
                                   store_residuals=cfg.store_residuals,
                                   bwd_bufs=cfg.bwd_bufs)
    rgb3, sigma = fused(ops.vanilla_weights_from_params(params), enc_x, enc_d)
    return rgb3.reshape(3, r, p), sigma.reshape(r, p)


def _apply_prop(prop: ProposalNetwork, params, pts, cfg: PipelineConfig):
    """ProposalNetwork apply — fused kernel when no input grads are needed."""
    if not use_pallas(cfg):
        return prop.apply({"params": params}, pts)
    from nerf_tpu import ops


    pts = jax.lax.stop_gradient(pts)
    r, p = pts.shape[:2]
    pts_f = pts.reshape(r * p, 3)
    enc = fastmath.cat_pos_pe(pts_f, prop.pos_levels,
                              _fused_kernel_args(cfg)[0],
                              doubling=cfg.pe_doubling)
    fused = ops.make_prop_fused(*_fused_kernel_args(cfg),
                                store_residuals=(
                                    cfg.store_residuals
                                    if cfg.prop_store_residuals is None
                                    else cfg.prop_store_residuals),
                                bwd_bufs=cfg.bwd_bufs)
    return fused(ops.prop_weights_from_params(params), enc).reshape(r, p)


def _proposal_weights(prop: ProposalNetwork, prop_params, rays, c_z, cfg,
                      train: bool, with_grad: bool = False):
    """Run the proposal net and produce max-blurred sampling weights.

    Train parity: density -> softplus -> transmittance (train.py:169-171).
    Eval parity:  density -> relu inside the weight computation
    (procedures.py:67-68 — the eval path never applies softplus).
    Returns (blurred_weights, raw_weights, coarse_grad_or_None).
    """
    c_pts = render_lib.lengths_to_points(rays, c_z)

    def density_fn(p):
        if with_grad:
            # the fused kernel has zero input cotangents; d(density)/d(pos)
            # for proposal normals must go through the flax/XLA path
            return prop.apply({"params": prop_params}, p)
        return _apply_prop(prop, prop_params, p, cfg)

    coarse_grad = None
    if with_grad:
        raw_density, vjp_fn = jax.vjp(density_fn, c_pts)
        (g,) = vjp_fn(jnp.ones_like(raw_density))
        g_norm = jnp.linalg.norm(g, axis=-1, keepdims=True)
        coarse_grad = -(g / jnp.maximum(1e-5, g_norm))
        if not cfg.second_order_normals:
            # reference parity: create_graph=False (train.py:168)
            coarse_grad = jax.lax.stop_gradient(coarse_grad)
    else:
        raw_density = density_fn(c_pts)

    if train:
        density = jax.nn.softplus(raw_density)
        act = lambda x: x  # already activated
    else:
        density = raw_density
        act = jax.nn.relu
    w_raw = render_lib.transmittance_weights(
        density, c_z, ray_dirs=rays[..., 3:], density_act=act
    )
    w_blur = sampling.max_blur_filter(w_raw, cfg.max_blur_alpha)
    return w_blur, w_raw, coarse_grad


# ---------------------------------------------------------------------------
# fine stage
# ---------------------------------------------------------------------------

def _rbg_noise_key(key):
    """Re-wrap a (possibly legacy uint32) threefry key as an rbg key.

    jax.random draws under the rbg impl lower to RngBitGenerator — the
    TPU-native PRNG — instead of a threefry hash program (~0.6 ms/step for
    the (N, 128) bottleneck noise, round-3 trace).  Deterministic in the
    input key; used only where the realization (not the stream) matters.
    """
    kd = (key if jnp.issubdtype(key.dtype, jnp.integer)
          else jax.random.key_data(key))
    return jax.random.wrap_key_data(
        jnp.concatenate([kd, kd]).astype(jnp.uint32), impl="rbg")


def _ref_fine_forward_allkernel(nerf: RefNeRF, nerf_params, pos, dirs,
                                noise_key, train: bool, need_grad: bool,
                                cfg: PipelineConfig):
    """All-kernel fused Ref-NeRF forward (cfg.ref_kernels="all").

    The whole fine forward runs as the two Pallas kernels of
    ops/ref_fused.py — spatial trunk + packed heads (+ in-kernel
    d(sigma)/d(enc)), then directional-with-glue (normalize/reflect/IDE/
    trunk/composition) whose in-kernel jax.vjp emits d(heads).  Nothing
    wider than the (N, 139) heads crosses HBM between them.

    Only valid for detached normal targets (second_order_normals=False);
    callers fall back to the flax path otherwise.
    """
    from nerf_tpu import ops

    cd, tile, interpret = _fused_kernel_args(cfg)
    r, p = pos.shape[:2]
    n = r * p
    pos_f = jax.lax.stop_gradient(pos).reshape(n, 3)
    # dirs are per-ray constants broadcast over the P samples (every call
    # site passes broadcast_to(rays[:, None, 3:])): build the kernel's
    # ROW-LAND (3, N) dirs from the (R, 3) originals so the (N, 3) form —
    # whose staging ran at 3/128 lanes (0.23 ms/step, round-3 trace) —
    # never materializes
    dirs_ray = jax.lax.stop_gradient(dirs[:, 0, :])
    dirs3 = jnp.broadcast_to(
        dirs_ray.T[:, :, None], (3, r, p)).reshape(3, n)
    # cast at construction: the convert fuses into the PE sin fusion and the
    # custom-vjp residual is the cd array — an f32 enc residual cost an extra
    # 47 MB/step materialization (round-3 trace); matches the flax path's
    # enc.astype(self.dtype)
    enc = fastmath.cat_pos_pe(pos_f, nerf.pos_levels, cd,
                              doubling=cfg.pe_doubling)
    if train and noise_key is not None and nerf.perturb_bottleneck > 0:
        # cd draw: the (N, 128) noise is the largest kernel operand; f32
        # cost 100 MB/step of threefry+materialize (0.8 ms, round-3 trace).
        # rbg impl: the threefry hash itself was another ~0.6 ms/step of VPU
        # work — RngBitGenerator lowers to the TPU-native PRNG.  The rbg key
        # is derived from noise_key per step, so the draw stays deterministic
        # in (seed, step); only the realization differs from the oracle flax
        # path, which already draws a different stream (module make_rng).
        noise = nerf.perturb_bottleneck * jax.random.normal(
            _rbg_noise_key(noise_key), (n, nerf.bottleneck_dim), dtype=cd)
    else:
        noise = jnp.zeros((n, nerf.bottleneck_dim), cd)

    ws = (ops.ref_spatial_weights_from_params(nerf_params)
          + ops.ref_directional_weights_from_params(nerf_params))
    # cfg.pallas_tile straight through: the old min(tile, 256) spa
    # cap predated the raised kernel VMEM ceiling (ops/fused_mlp._VMEM_LIMIT)
    fused = ops.make_ref_fused(
        cd, tile=tile, interpret=interpret, need_grad=need_grad,
        ide_level=nerf.ide_level, use_srgb=nerf.use_srgb,
        store_residuals=cfg.store_residuals, bwd_bufs=cfg.bwd_bufs)
    rgb3, density, normal3, dgrad3 = fused(ws, enc, dirs3, noise, pos=pos_f)

    # rgb AND normals stay ROW-LAND (3, R, P) out to the composite/losses —
    # see _ref_fine_forward's contract note
    density_grad = None
    if need_grad:
        density_grad = jax.lax.stop_gradient(dgrad3).reshape(3, r, p)
    return (rgb3.astype(jnp.float32).reshape(3, r, p), density.reshape(r, p),
            normal3.astype(jnp.float32).reshape(3, r, p), density_grad)


def _ref_fine_forward_fused(nerf: RefNeRF, nerf_params, pos, dirs, noise_key,
                            train: bool, need_grad: bool,
                            cfg: PipelineConfig):
    """Hybrid fused Ref-NeRF forward: Pallas spatial kernel + XLA directional
    (cfg.ref_kernels="hybrid"; kept as an A/B alternative — the row-land
    all-kernel variant is the default and faster, 49.4k vs 35.1k rays/s).

    The spatial kernel computes the trunk, the packed heads AND the
    density-gradient normal targets in one VMEM residency; the directional
    branch stays in XLA, where the IDE/reflection glue fuses into the
    matmul fusions.

    Only valid for detached normal targets (cfg.second_order_normals=False)
    — the caller falls back to the flax path otherwise.
    """
    from nerf_tpu import ops
    from nerf_tpu.ops.ref_fused import _make_spa_fused

    cd, tile, interpret = _fused_kernel_args(cfg)
    # cfg.pallas_tile straight through, like the all-kernel path: the old
    # min(tile, 256) cap predated the raised per-kernel scoped-VMEM ceiling
    # (ops/fused_mlp._VMEM_LIMIT) — the same spa kernel now runs fastest at
    # tile=1024 (round-3 sweep: 6.22 ms @256 -> 5.56 @1024)
    r, p = pos.shape[:2]
    n = r * p
    pos_f = jax.lax.stop_gradient(pos).reshape(n, 3)
    enc = fastmath.cat_pos_pe(pos_f, nerf.pos_levels, cd,
                              doubling=cfg.pe_doubling)

    spa = _make_spa_fused(cd, tile, interpret, need_grad)
    heads, dgrad = spa(ops.ref_spatial_weights_from_params(nerf_params),
                       enc, pos_f)

    density_grad = None
    if need_grad:
        density_grad = jax.lax.stop_gradient(dgrad).reshape(3, r, p)

    # spatial post-processing identical to RefNeRF.spatial
    # (models/refnerf.py:79-92), then the flax directional branch — it
    # accepts the spatial_out dict, so gradients flow back through `heads`
    # into the kernel's weight-grad VJP
    dtype = nerf.dtype
    raw_density = heads[:, 1]
    normal = (-heads[:, 2:5]
              / (jnp.linalg.norm(heads[:, 2:5], axis=-1, keepdims=True)
                 + 1e-7))
    spatial_out = {
        "density": raw_density.reshape(r, p),
        "normal": normal.reshape(r, p, 3),
        "roughness": jax.nn.softplus(
            heads[:, 0:1] - 1.0).astype(dtype).reshape(r, p, 1),
        "diffuse": heads[:, 5:8].astype(dtype).reshape(r, p, 3),
        "tint": heads[:, 8:11].astype(dtype).reshape(r, p, 3),
        "bottleneck": heads[:, 11:].astype(dtype).reshape(r, p, -1),
    }
    rngs = {"noise": noise_key} if (train and noise_key is not None) else None
    rgb = nerf.apply({"params": nerf_params}, spatial_out, dirs, train,
                     method=RefNeRF.directional, rngs=rngs)
    normal3 = jnp.moveaxis(
        normal.astype(jnp.float32).reshape(r, p, 3), -1, 0)
    return (jnp.moveaxis(rgb, -1, 0), raw_density.reshape(r, p), normal3,
            density_grad)


def _ref_fine_forward(nerf: RefNeRF, nerf_params, pos, dirs, noise_key,
                      train: bool, need_grad: bool,
                      second_order: bool = False,
                      cfg: Optional[PipelineConfig] = None):
    """Ref-NeRF forward with optional d(sigma)/d(pos) via one shared vjp.

    The reference re-walks the torch autograd graph with retain_graph
    (ref_model.py:119-125); here a single jax.vjp over the spatial trunk
    yields the per-point density gradient with one extra backward and no
    recomputation. By default the gradient is a DETACHED constant target,
    matching torch's create_graph=False; ``second_order=True`` keeps it
    differentiable (cfg.second_order_normals).

    With cfg given, use_pallas resolves, and the normal targets are detached
    (not second_order), the fused-kernel path runs instead (valid: sampled
    positions carry no parameter gradient, and the density gradient is a
    constant the spatial kernel computes in its own forward).

    Contract: rgb, pred_normal and density_grad return ROW-LAND, shape
    (3, R, P).  The (R, P, 3) layout puts the composite/loss glue at 3/128
    lane occupancy on TPU (21x roofline, round-3 trace); every variant of
    this function emits (3, R, P) so the downstream glue stays at full
    lanes (eval transposes back once per frame).
    """
    # Fused-kernel dispatch (auto: ON on TPU backends, like the vanilla
    # path).  History: round-2's MLP-only kernels LOST to XLA (29.6k vs
    # 38.3k rays/s — the IDE/reflection glue that XLA fuses into matmul
    # fusions cannot fuse into opaque custom-calls); round 3's
    # ref_kernels="all" variant puts the glue INSIDE the directional kernel
    # in row-land layout and WINS (49.4k rays/s, BENCHMARKS.md).
    if (cfg is not None and use_pallas(cfg) and not second_order
            and nerf.cat_origin):
        fwd = (_ref_fine_forward_allkernel if cfg.ref_kernels == "all"
               else _ref_fine_forward_fused)
        return fwd(nerf, nerf_params, pos, dirs, noise_key, train,
                   need_grad, cfg)

    def spatial_fn(p):
        out = nerf.apply({"params": nerf_params}, p, method=RefNeRF.spatial)
        return out["density"], out

    if need_grad:
        raw_density, vjp_fn, spa = jax.vjp(spatial_fn, pos, has_aux=True)
        (g,) = vjp_fn(jnp.ones_like(raw_density))
        g_norm = jnp.linalg.norm(g, axis=-1, keepdims=True)
        density_grad = jnp.moveaxis(-(g / jnp.maximum(1e-5, g_norm)), -1, 0)
        if not second_order:
            density_grad = jax.lax.stop_gradient(density_grad)
    else:
        raw_density, spa = spatial_fn(pos)
        density_grad = None

    rngs = {"noise": noise_key} if (train and noise_key is not None) else None
    rgb = nerf.apply(
        {"params": nerf_params}, spa, dirs, train,
        method=RefNeRF.directional, rngs=rngs,
    )
    return (jnp.moveaxis(rgb, -1, 0), raw_density,
            jnp.moveaxis(spa["normal"], -1, 0), density_grad)


def _mip_pass(nerf, nerf_params, rays, edges, cfg: PipelineConfig,
              white_bkg: bool = False, render_depth: bool = False,
              rowland: bool = False):
    """One Mip-NeRF level: cone edges -> IPE -> shared net -> composite.

    edges: (R, P+1) sorted depths defining P conical frustums. Returns
    (rgb_out (R, 3), cone_weights (R, P), extras).
    """
    from nerf_tpu.core.encoding import ipe_feature

    feat, mu, mu_t = ipe_feature(edges, rays, nerf.pos_levels, cfg.ipe_radius)
    enc_x = jnp.concatenate([mu, feat], axis=-1) if nerf.cat_origin else feat
    dirs = jnp.broadcast_to(rays[:, None, 3:], mu.shape)
    rgb3, sigma = _apply_vanilla(nerf, nerf_params, mu, dirs, cfg, enc_x)
    if rowland:
        # TRAIN passes composite ROW-LAND: the (R, P, 3) multiply-reduce runs
        # at 3/128 lanes on TPU (see render_lib.composite_rl); the win is the
        # backward, so forward-only eval keeps the plain composite (+ extras)
        rgb_out, w = render_lib.composite_rl(
            rgb3, sigma, mu_t, rays[:, 3:], white_bkg=white_bkg)
        return rgb_out, w, {}, mu_t
    rgb = jnp.moveaxis(rgb3, 0, -1)  # eval: once per frame chunk
    out = render_lib.composite(
        rgb, sigma, mu_t, rays[:, 3:], white_bkg=white_bkg,
        depth_bounds=(cfg.near, cfg.far) if render_depth else None,
    )
    return (*out, mu_t)


def render_rays_train(models, variables, rays, key, cfg: PipelineConfig,
                      noise: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None):
    """Training forward for a ray batch. Returns a dict of render outputs.

    Mirrors the reference run() closure (train.py:164-199) end to end.
    rays: (R, 6).  ``noise`` = (stratified jitter (R, n_coarse [+1 for mip]),
    SORTED inverse-CDF uniforms (R, n_fine+1)) overrides the internal draws —
    used by the trajectory-parity harness to feed this step and the
    reference's torch step identical randomness (test_trajectory_parity.py).
    """
    nerf, prop = models
    if noise is None:
        k_strat, k_inv, k_noise = jax.random.split(key, 3)
        jitter = u = None
    else:
        k_strat = k_inv = None
        k_noise = key
        jitter, u = noise
    n_rays = rays.shape[0]

    if cfg.model == "mip":
        # true Mip-NeRF: one net, two IPE passes, self-resampling
        from nerf_tpu.core.fastmath import sorted_uniforms

        c_edges = sampling.stratified_samples(
            k_strat, n_rays, cfg.n_coarse + 1, cfg.near, cfg.far,
            jitter=jitter)
        coarse_rgb, w_c, _, _ = _mip_pass(nerf, variables["nerf"], rays, c_edges,
                                          cfg, rowland=True)
        w_blur = sampling.max_blur_filter(
            jax.lax.stop_gradient(w_c), cfg.max_blur_alpha)
        if u is None:
            u = sorted_uniforms(k_inv, (n_rays, cfg.n_fine + 1))
        f_edges, _, _ = sampling.sample_pdf(
            None, c_edges, w_blur, cfg.n_fine + 1, u=u)
        fine_rgb, w_f, _, mu_t = _mip_pass(nerf, variables["nerf"], rays, f_edges,
                                           cfg, rowland=True)
        # z_fine = frustum CENTERS mu_t: where the weights actually apply
        # (consumed by the distortion/entropy regularizers)
        return {"fine_rgb": fine_rgb, "coarse_rgb": coarse_rgb,
                "weights": w_f, "z_fine": mu_t}

    c_z = sampling.stratified_samples(k_strat, n_rays, cfg.n_coarse, cfg.near,
                                      cfg.far, jitter=jitter)
    need_prop_grad = cfg.prop_normal and cfg.model == "ref"
    w_blur, _, coarse_grad = _proposal_weights(
        prop, variables["prop"], rays, c_z, cfg, train=True, with_grad=need_prop_grad
    )

    f_z, below = sampling.inverse_sample(k_inv, w_blur, c_z, cfg.n_fine + 1,
                                         sort=True, u=u)
    out: Dict[str, Any] = {"prop_weights": w_blur, "coarse_grad": coarse_grad}

    if cfg.model == "ref":
        z_merged, _, coarse_pos, idx_full = sampling.merge_coarse_fine(c_z, f_z, below)
        pos = render_lib.lengths_to_points(rays, z_merged)
        dirs = jnp.broadcast_to(rays[:, None, 3:], pos.shape)
        rgb3, raw_density, pred_normal, density_grad = _ref_fine_forward(
            nerf, variables["nerf"], pos, dirs, k_noise, train=True,
            need_grad=True, second_order=cfg.second_order_normals, cfg=cfg
        )
        density = jax.nn.softplus(raw_density + 0.5)  # train.py:181 parity
        fine_rgb, weights = render_lib.composite_rl(
            rgb3, density, z_merged, rays[:, 3:], density_act=lambda x: x
        )
        out.update(
            fine_rgb=fine_rgb,
            weights=weights,
            bounds_idx=idx_full,
            # (3, R, P) row-land; see _ref_fine_forward's contract note
            pred_normal=pred_normal,
            density_grad=density_grad,
            # per-RAY view dirs (R, 3): the backface loss broadcasts them
            # over the P samples itself (dirs was their broadcast anyway)
            fine_dirs=rays[:, 3:],
            coarse_pos=coarse_pos,
            z_merged=z_merged,
        )
        if need_prop_grad:
            # merged position of the LAST fine sample — the element the
            # reference's off-by-one coarse_grad_select treats as coarse
            # (consumed only under cfg.legacy_coarse_select)
            out["last_fine_pos"] = (cfg.n_fine
                                    + sampling.count_lt(c_z, f_z[:, -1:])[:, 0])
    else:
        pos, z_fine, enc_x = _vanilla_inputs(nerf, rays, f_z, cfg)
        dirs = jnp.broadcast_to(rays[:, None, 3:], pos.shape)
        rgb3, sigma = _apply_vanilla(nerf, variables["nerf"], pos, dirs, cfg,
                                     enc_x)
        fine_rgb, weights = render_lib.composite_rl(rgb3, sigma, z_fine,
                                                    rays[:, 3:])
        out.update(fine_rgb=fine_rgb, weights=weights, bounds_idx=below, z_fine=z_fine)

    out["bounds"] = sampling.weight_bounds(w_blur, out["bounds_idx"])
    return out


def render_rays_eval(models, variables, rays, key, cfg: PipelineConfig,
                     sample_num: Optional[int] = None,
                     render_depth: bool = False,
                     normal_cam_dir: Optional[jnp.ndarray] = None,
                     noise: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None):
    """Eval forward for a ray batch (no_grad path of procedures.py:34-97).

    Returns (rgb (R, 3), extras dict).  ``normal_cam_dir`` enables the normal
    map extra (ref model only).  ``noise`` = (stratified jitter (R, n_coarse),
    inverse-CDF uniforms (R, sample_num+1)) makes the render independent of
    how rays are chunked.
    """
    nerf, prop = models
    # Eval is forward-only, so the pin is model-dependent (round-5 A/B at
    # eval chunk shapes, tools/eval_ab, v5e 400x400 frame, chunk=4096):
    # vanilla/mip render FASTER on the XLA forward (0.449 vs 0.545 s/frame
    # — the kernels' training win is backward activation traffic, which
    # eval doesn't have), but the REF frame is 15% faster on the
    # forward-only kernels (0.978 vs 1.152 s — the row-land IDE/reflection
    # glue fuses in-kernel where the forward-only XLA program leaves it as
    # narrow standalone ops).  store_residuals=False on the default eval
    # path: residual HBM writes are pure waste without a backward
    # (measured 1.031 s vs 0.978).  cfg.eval_use_pallas overrides both for
    # A/B measurement (tools/eval_ab.py sets store_residuals itself).
    if cfg.eval_use_pallas is not None:
        cfg = cfg.replace(use_pallas=cfg.eval_use_pallas)
    else:
        cfg = cfg.replace(use_pallas=cfg.model == "ref" and use_pallas(cfg),
                          store_residuals=False)
    sample_num = cfg.n_fine if sample_num is None else sample_num
    if noise is None:
        k_strat, k_inv = jax.random.split(key)
        jitter, u = None, None
    else:
        k_strat = k_inv = None
        jitter, u = noise
    n_rays = rays.shape[0]

    if cfg.model == "mip":
        from nerf_tpu.core.fastmath import sorted_uniforms

        c_edges = sampling.stratified_samples(
            k_strat, n_rays, cfg.n_coarse + 1, cfg.near, cfg.far, jitter=jitter)
        _, w_c, _, _ = _mip_pass(nerf, variables["nerf"], rays, c_edges, cfg)
        w_blur = sampling.max_blur_filter(w_c, cfg.max_blur_alpha)
        if u is None:
            u = sorted_uniforms(k_inv, (n_rays, sample_num + 1))
        f_edges, _, _ = sampling.sample_pdf(
            None, c_edges, w_blur, sample_num + 1, u=u)
        rgb_out, _, extras, _ = _mip_pass(
            nerf, variables["nerf"], rays, f_edges, cfg,
            white_bkg=cfg.white_bkg, render_depth=render_depth)
        return rgb_out, extras

    c_z = sampling.stratified_samples(k_strat, n_rays, cfg.n_coarse, cfg.near,
                                      cfg.far, jitter=jitter)
    w_blur, _, _ = _proposal_weights(prop, variables["prop"], rays, c_z, cfg, train=False)
    f_z, _ = sampling.inverse_sample(k_inv, w_blur, c_z, sample_num + 1, sort=True, u=u)

    normal = None
    if cfg.model == "ref":
        z_vals, _, _ = sampling.merge_coarse_fine(c_z, f_z)
        pos = render_lib.lengths_to_points(rays, z_vals)
        dirs = jnp.broadcast_to(rays[:, None, 3:], pos.shape)
        rgb3, raw_density, normal3, _ = _ref_fine_forward(
            nerf, variables["nerf"], pos, dirs, None, train=False,
            need_grad=False, cfg=cfg
        )
        # composite's extras want (R, P, 3); eval renders one frame so the
        # transposes are noise
        rgb = jnp.moveaxis(rgb3, 0, -1)
        normal = jnp.moveaxis(normal3, 0, -1)
        density = jax.nn.softplus(raw_density + 0.5)  # procedures.py:74 parity
        act = lambda x: x
    else:
        pos, z_vals, enc_x = _vanilla_inputs(nerf, rays, f_z, cfg)
        dirs = jnp.broadcast_to(rays[:, None, 3:], pos.shape)
        rgb3, density = _apply_vanilla(nerf, variables["nerf"], pos, dirs,
                                       cfg, enc_x)
        rgb = jnp.moveaxis(rgb3, 0, -1)  # once per eval chunk: noise
        act = jax.nn.relu

    normal_info = None
    if normal_cam_dir is not None and normal is not None:
        normal_info = (normal, normal_cam_dir)
    rgb_out, weights, extras = render_lib.composite(
        rgb, density, z_vals, rays[:, 3:],
        white_bkg=cfg.white_bkg, density_act=act,
        depth_bounds=(cfg.near, cfg.far) if render_depth else None,
        normal_info=normal_info,
    )
    return rgb_out, extras
