"""Full-image eval renderer.

Capability parity (behavior, not code): render_image
(/root/reference/nerf/procedures.py:34-97).  Instead of a Python double loop
over sz x sz spatial patches (procedures.py:62-63) the rays are processed as
fixed-size flat chunks under jax.lax.map, so the whole frame renders as one
compiled program regardless of image size; chunking bounds peak memory the
same way patches did.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.core import rays as rays_lib
from nerf_tpu.train.config import PipelineConfig
from nerf_tpu.train.pipeline import render_rays_eval


def _pad_noise(jitter, u, pad: int, chunk: int):
    """Pad per-pixel noise rows to the chunked length and reshape to chunks."""
    jitter = jnp.concatenate(
        [jitter, jnp.full((pad, jitter.shape[1]), 0.5, jitter.dtype)], axis=0)
    u = jnp.concatenate(
        [u, jnp.full((pad, u.shape[1]), 0.5, u.dtype)], axis=0)
    return (jitter.reshape(-1, chunk, jitter.shape[1]),
            u.reshape(-1, chunk, u.shape[1]))


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "hw", "focal", "sample_num", "render_depth",
                     "render_normal", "chunk"),
)
def _render_image_jit(variables, c2w, key, *, cfg: PipelineConfig, hw, focal,
                      sample_num, render_depth, render_normal, chunk):
    from nerf_tpu.train.pipeline import make_models

    models = make_models(cfg)
    h, w = hw
    all_rays = rays_lib.full_image_rays(h, w, c2w, focal)
    n_pix = h * w
    pad = (-n_pix) % chunk
    n_padded = n_pix + pad
    all_rays = jnp.concatenate([all_rays, jnp.ones((pad, 6), all_rays.dtype)], axis=0)
    ray_chunks = all_rays.reshape(-1, chunk, 6)
    # pre-drawn noise for the whole frame -> chunk-size-invariant renders;
    # the inverse-CDF uniforms are drawn pre-sorted (order-statistics
    # construction) as inverse_sample(sort=True) requires
    from nerf_tpu.core.fastmath import sorted_uniforms

    k1, k2 = jax.random.split(key)
    n_strat = cfg.n_coarse + (1 if cfg.model == "mip" else 0)
    # draw noise at the UNPADDED pixel count and pad afterwards: the padding
    # differs between this renderer and the sharded one ((-n)%chunk vs
    # (-n)%(chunk*n_dev)), and drawing at the padded shape would make their
    # bit-identical-output guarantee depend on the RNG implementation being
    # prefix-invariant (jax_threefry_partitionable) rather than hold by
    # construction.  Padded rows get constant 0.5 (valid sorted row); their
    # outputs are sliced away.
    jitter, u = _pad_noise(
        jax.random.uniform(k1, (n_pix, n_strat)),
        sorted_uniforms(k2, (n_pix, sample_num + 1)), pad, chunk)
    normal_cam_dir = c2w[:, 2] if render_normal else None

    def one_chunk(args):
        rays, jit_c, u_c = args
        rgb, extras = render_rays_eval(
            models, variables, rays, None, cfg,
            sample_num=sample_num,
            render_depth=render_depth,
            normal_cam_dir=normal_cam_dir,
            noise=(jit_c, u_c),
        )
        depth = extras.get("depth", jnp.zeros(rays.shape[0]))
        normal = extras.get("normal", jnp.zeros(rays.shape[0]))
        return rgb, depth, normal

    rgb, depth, normal = jax.lax.map(one_chunk, (ray_chunks, jitter, u))
    out = {"rgb": rgb.reshape(-1, 3)[:n_pix].reshape(h, w, 3)}
    if render_depth:
        out["depth"] = depth.reshape(-1)[:n_pix].reshape(h, w)
    if render_normal:
        out["normal"] = normal.reshape(-1)[:n_pix].reshape(h, w)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "hw", "focal", "sample_num", "render_depth",
                     "render_normal", "chunk", "mesh"),
)
def _render_image_sharded_jit(variables, c2w, key, *, cfg: PipelineConfig,
                              hw, focal, sample_num, render_depth,
                              render_normal, chunk, mesh):
    """Frame render with the ray-chunk axis sharded over ALL mesh devices.

    Beyond the reference, which renders eval frames redundantly on every
    rank (ddp_train.py:264-283): here each chip renders 1/n of the chunks
    and the frame is all-gathered.  Noise is pre-drawn per PIXEL at the
    unpadded count, so the draws match the single-device renderer exactly;
    output is bit-identical when both paths pad to the same chunk grid and
    within a float ulp otherwise (different grid shapes compile to
    differently-fused programs; measured max 3e-8, test_renderer.py).
    """
    from jax.sharding import PartitionSpec as P

    from nerf_tpu.core.fastmath import sorted_uniforms
    from nerf_tpu.train.pipeline import make_models

    models = make_models(cfg)
    h, w = hw
    n_dev = mesh.size
    all_rays = rays_lib.full_image_rays(h, w, c2w, focal)
    n_pix = h * w
    pad = (-n_pix) % (chunk * n_dev)  # chunks must split evenly over devices
    n_padded = n_pix + pad
    all_rays = jnp.concatenate(
        [all_rays, jnp.ones((pad, 6), all_rays.dtype)], axis=0)
    ray_chunks = all_rays.reshape(-1, chunk, 6)
    k1, k2 = jax.random.split(key)
    n_strat = cfg.n_coarse + (1 if cfg.model == "mip" else 0)
    # same unpadded-draw-then-pad as the single-device renderer: identical
    # draws for any device count, so bit-identical output by construction
    jitter, u = _pad_noise(
        jax.random.uniform(k1, (n_pix, n_strat)),
        sorted_uniforms(k2, (n_pix, sample_num + 1)), pad, chunk)
    normal_cam_dir = c2w[:, 2] if render_normal else None

    def one_chunk(args):
        rays, jit_c, u_c = args
        rgb, extras = render_rays_eval(
            models, variables, rays, None, cfg,
            sample_num=sample_num,
            render_depth=render_depth,
            normal_cam_dir=normal_cam_dir,
            noise=(jit_c, u_c),
        )
        depth = extras.get("depth", jnp.zeros(rays.shape[0]))
        normal = extras.get("normal", jnp.zeros(rays.shape[0]))
        return rgb, depth, normal

    def per_device(rc, jc, uc):
        return jax.lax.map(one_chunk, (rc, jc, uc))

    spec = P(("replica", "data"))
    rgb, depth, normal = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )(ray_chunks, jitter, u)
    out = {"rgb": rgb.reshape(-1, 3)[:n_pix].reshape(h, w, 3)}
    if render_depth:
        out["depth"] = depth.reshape(-1)[:n_pix].reshape(h, w)
    if render_normal:
        out["normal"] = normal.reshape(-1)[:n_pix].reshape(h, w)
    return out


def render_image(variables, c2w, hw, focal, cfg: PipelineConfig,
                 sample_num: Optional[int] = None, render_depth: bool = False,
                 render_normal: bool = False, key=None,
                 chunk: int = 4096, mesh=None) -> Dict[str, np.ndarray]:
    """Render a full frame; returns numpy images in [0, 1].

    render_normal is only honored for the ref model (procedures.py:40 parity).
    With ``mesh`` given, ray chunks are sharded over every mesh device
    (bit-identical output; ~n_devices times faster full-frame eval).
    """
    sample_num = cfg.n_fine if sample_num is None else sample_num
    render_normal = render_normal and cfg.model == "ref"
    key = jax.random.PRNGKey(0) if key is None else key
    c2w = jnp.asarray(np.asarray(c2w, np.float32)[:3, :])
    kwargs = dict(
        cfg=cfg, hw=(int(hw[0]), int(hw[1])),
        focal=(float(focal[0]), float(focal[1])), sample_num=int(sample_num),
        render_depth=bool(render_depth), render_normal=bool(render_normal),
        chunk=int(chunk),
    )
    if mesh is None:
        out = _render_image_jit(variables, c2w, key, **kwargs)
    else:
        out = _render_image_sharded_jit(variables, c2w, key, mesh=mesh,
                                        **kwargs)
        if jax.process_count() > 1:
            from nerf_tpu.parallel.mesh import replicate_tree

            out = replicate_tree(out, mesh)
    return {k: np.asarray(v) for k, v in out.items()}
