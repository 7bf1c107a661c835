"""Volume rendering: transmittance weights and alpha compositing.

Capability parity (behavior, not code) with:
  - transmittance weights: /root/reference/nerf/nerf_base.py:79-86
    (getNormedWeight) and /root/reference/nerf/addtional.py:99-107
    (ProposalNetwork.get_weights, which additionally scales depth by ||d||)
  - composite + extras:    /root/reference/nerf/nerf_base.py:90-113 (render)
  - ray lengths -> points: /root/reference/nerf/nerf_base.py:52-56

Numerics: the composite is kept in float32 regardless of the model compute
dtype — exp(-sigma * delta) with the 1e10 far-plane sentinel and the cumprod
chain are the parts of this pipeline that do not survive bf16
(SURVEY.md section 7 "hard parts").
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

FAR_DELTA = 1e10  # open-ended final interval sentinel (nerf_base.py:81)


def lengths_to_points(rays: jnp.ndarray, zvals: jnp.ndarray) -> jnp.ndarray:
    """rays (R, 6), zvals (R, P) -> points (R, P, 3). Parity nerf_base.py:52-56
    (the reference also concatenates the per-ray direction; models here take
    positions and directions as separate arguments instead)."""
    return rays[..., None, :3] + rays[..., None, 3:] * zvals[..., :, None]


def transmittance_weights(density: jnp.ndarray, zvals: jnp.ndarray,
                          ray_dirs: Optional[jnp.ndarray] = None,
                          density_act=jax.nn.relu,
                          final_delta=None) -> jnp.ndarray:
    """alpha-compositing weights w_i = alpha_i * prod_{j<i} (1 - alpha_j).

    density: (R, P) raw density (activated here via ``density_act``);
    zvals: (R, P); if ``ray_dirs`` is given, depths are scaled by ||d||
    (addtional.py:99-101). Matches nerf_base.py:79-86 including the 1e-10
    cumprod epsilon and the 1e10 final delta.

    ``final_delta`` overrides the 1e10 sentinel for the LAST sample (scalar
    or array broadcastable to (..., 1), in the same metric units as zvals).
    The sentinel is the right convention for a trained model (any residual
    density at the far plane terminates the ray), but it is wrong for
    quadrature of an analytic field: it turns never-exactly-zero density
    tails (~1e-10) into near-full opacity, an unfittable target.  Ground
    truth generation passes the honest final bin width instead (see
    data/synthetic.render_gt_image and BENCHMARKS.md round 4).

    Computed in float32; the cumprod is expressed as exp(cumsum(log)) — on
    TPU a log-space cumulative sum fuses better than cumprod and is
    numerically identical at these magnitudes (mult >= 1e-10 guarantees the
    log is finite).
    """
    density = density.astype(jnp.float32)
    zvals = zvals.astype(jnp.float32)
    if ray_dirs is not None:
        zvals = zvals * jnp.linalg.norm(ray_dirs, axis=-1, keepdims=True)
    if final_delta is None:
        final_delta = FAR_DELTA
    last = jnp.broadcast_to(
        jnp.asarray(final_delta, jnp.float32), (*zvals.shape[:-1], 1))
    delta = jnp.concatenate(
        [zvals[..., 1:] - zvals[..., :-1], last], axis=-1)
    from nerf_tpu.core.fastmath import cumsum_mm

    mult = jnp.exp(-density_act(density) * delta)
    alpha = 1.0 - mult
    # exclusive log-space cumsum as a triangular matmul: XLA's lane-dimension
    # cumsum lowers to a serial shift chain on TPU; one small fp32 MXU matmul
    # replaces it (trans[0] = exp(0) = 1 from the exclusive form)
    trans = jnp.exp(cumsum_mm(jnp.log(mult + 1e-10), exclusive=True))
    return alpha * trans


def composite(rgb: jnp.ndarray, density: jnp.ndarray, zvals: jnp.ndarray,
              ray_dirs: jnp.ndarray, mul_norm: bool = True,
              white_bkg: bool = False, density_act=jax.nn.relu,
              depth_bounds: Optional[Tuple[float, float]] = None,
              normal_info: Optional[Tuple] = None):
    """Alpha-composite per-sample radiance into per-ray RGB.

    rgb: (R, P, 3); density: (R, P); zvals: (R, P); ray_dirs: (R, 3).
    Returns (rgb_out (R, 3), weights (R, P), extras dict).  Behavior parity:
    nerf_base.py:90-113 — white-background completion, normalized depth map,
    and camera-axis normal map extras.
    """
    weights, zv = _composite_weights(density, zvals, ray_dirs, mul_norm,
                                     density_act)
    rgb_out = jnp.sum(weights[..., None] * rgb.astype(jnp.float32), axis=-2)
    rgb_out = _white_bkg(rgb_out, weights) if white_bkg else rgb_out
    extras = {}
    if depth_bounds is not None:
        near, far = depth_bounds
        extras["depth"] = (jnp.sum(weights * zv, axis=-1) - near) / (far - near)
    if normal_info is not None:
        normal, cam_dir = normal_info  # (R, P, 3), (3,)
        proj = jnp.sum(normal * cam_dir[None, None, :], axis=-1)
        extras["normal"] = (jnp.sum(weights * proj, axis=-1) + 1.0) * 0.5
    return rgb_out, weights, extras


def _composite_weights(density, zvals, ray_dirs, mul_norm, density_act):
    """Shared ray-norm scaling + transmittance weights of both composites."""
    zv = zvals.astype(jnp.float32)
    if mul_norm:
        zv = zv * jnp.linalg.norm(ray_dirs.astype(jnp.float32), axis=-1,
                                  keepdims=True)
    return transmittance_weights(density, zv, ray_dirs=None,
                                 density_act=density_act), zv


def _white_bkg(rgb_out, weights):
    acc = jnp.sum(weights, axis=-1)
    return rgb_out + (1.0 - acc[..., None])


def composite_rl(rgb3: jnp.ndarray, density: jnp.ndarray, zvals: jnp.ndarray,
                 ray_dirs: jnp.ndarray, mul_norm: bool = True,
                 white_bkg: bool = False, density_act=jax.nn.relu):
    """``composite`` with ROW-LAND radiance: rgb3 (3, R, P) -> rgb_out (R, 3).

    Same math as ``composite`` (no extras — train paths only).  On TPU an
    (R, P, 3) f32 array tiles its last two dims to (8, 128), so the
    weights*rgb multiply-reduce runs on 3 of 128 lanes — the round-3 trace
    priced its backward alone at 0.21 ms/step, ~10-20x its HBM roofline.
    (3, R, P) keeps the points along lanes; the one transpose the caller
    pays to get there is a 2.4 MB layout copy.
    """
    weights, _ = _composite_weights(density, zvals, ray_dirs, mul_norm,
                                    density_act)
    rgb_out = jnp.sum(weights[None] * rgb3.astype(jnp.float32), axis=-1).T
    return (_white_bkg(rgb_out, weights) if white_bkg else rgb_out), weights


def mse_to_psnr(mse: jnp.ndarray) -> jnp.ndarray:
    """PSNR from MSE (addtional.py:45-51 parity)."""
    return -10.0 * jnp.log(mse) / jnp.log(10.0)
