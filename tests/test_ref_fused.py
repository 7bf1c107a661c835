"""Fused Ref-NeRF kernels (ops/ref_fused.py) vs the flax/XLA oracle.

Runs on CPU in Pallas interpret mode (tests/conftest.py). The flax modules
in models/refnerf.py remain the correctness reference: forward values,
parameter gradients through the whole train loss, and the density-gradient
normal targets must all agree.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_tpu.train.config import PipelineConfig
from nerf_tpu.train.pipeline import (
    _ref_fine_forward, init_variables, make_models,
)


def _setup(use_srgb=False):
    cfg_base = dict(model="ref", ray_batch=4, n_coarse=8, n_fine=16,
                    nerf_width=32, prop_width=32, use_srgb=use_srgb,
                    pallas_tile=64)
    cfg_xla = PipelineConfig(use_pallas=False, **cfg_base)
    cfg_fused = PipelineConfig(use_pallas=True, **cfg_base)
    nerf, _ = make_models(cfg_xla)
    params = init_variables(cfg_xla, jax.random.PRNGKey(0))["nerf"]
    rng = np.random.default_rng(3)
    r, p = 4, 24
    pos = jnp.asarray(rng.normal(0, 1.5, (r, p, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(0, 1, (r, 1, 3)).astype(np.float32))
    dirs = jnp.broadcast_to(dirs, (r, p, 3))
    return cfg_xla, cfg_fused, nerf, params, pos, dirs


@pytest.mark.parametrize("use_srgb", [False, True])
def test_ref_fused_forward_matches_flax(use_srgb):
    cfg_xla, cfg_fused, nerf, params, pos, dirs = _setup(use_srgb)
    out_x = _ref_fine_forward(nerf, params, pos, dirs, None, train=False,
                              need_grad=True, cfg=cfg_xla)
    out_f = _ref_fine_forward(nerf, params, pos, dirs, None, train=False,
                              need_grad=True, cfg=cfg_fused)
    names = ("rgb", "density", "normal", "density_grad")
    for name, a, b in zip(names, out_x, out_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5,
                                   err_msg=name)


def test_ref_fused_param_grads_match_flax():
    cfg_xla, cfg_fused, nerf, params, pos, dirs = _setup()

    def loss(p, cfg):
        rgb, density, normal, dgrad = _ref_fine_forward(
            nerf, p, pos, dirs, None, train=False, need_grad=True, cfg=cfg)
        # touch every output the train loss touches: rgb (image loss),
        # density (composite), normal + detached dgrad (normal losses)
        return (jnp.sum(rgb ** 2) + jnp.sum(jax.nn.softplus(density + 0.5))
                + jnp.sum((normal - dgrad) ** 2))

    lx, gx = jax.value_and_grad(lambda p: loss(p, cfg_xla))(params)
    lf, gf = jax.value_and_grad(lambda p: loss(p, cfg_fused))(params)
    np.testing.assert_allclose(float(lx), float(lf), rtol=1e-4)
    flat_x, _ = jax.flatten_util.ravel_pytree(gx)
    flat_f, _ = jax.flatten_util.ravel_pytree(gf)
    # identical structure, near-identical values (both paths are f32 here)
    np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_x),
                               rtol=5e-3, atol=2e-4)


def test_ref_fused_noise_path_shapes_and_determinism():
    """train=True with bottleneck noise: deterministic per key, noisy across
    keys (stream differs from flax's make_rng but distribution matches)."""
    cfg_xla, cfg_fused, nerf, params, pos, dirs = _setup()
    k = jax.random.PRNGKey(7)
    out1 = _ref_fine_forward(nerf, params, pos, dirs, k, train=True,
                             need_grad=False, cfg=cfg_fused)
    out2 = _ref_fine_forward(nerf, params, pos, dirs, k, train=True,
                             need_grad=False, cfg=cfg_fused)
    out3 = _ref_fine_forward(nerf, params, pos, dirs, jax.random.PRNGKey(8),
                             train=True, need_grad=False, cfg=cfg_fused)
    np.testing.assert_array_equal(np.asarray(out1[0]), np.asarray(out2[0]))
    # different key -> different noise -> (at least slightly) different rgb
    assert not np.array_equal(np.asarray(out1[0]), np.asarray(out3[0]))
    assert out1[3] is None  # need_grad=False -> no density grad


def test_ref_all_kernel_variant_matches_flax():
    """ops.make_ref_fused (the ALL-kernel variant incl. the directional+glue
    kernel; kept available though the default fused path is the hybrid
    spatial-kernel + XLA-directional split) — values and weight grads vs the
    flax oracle."""
    from nerf_tpu import ops
    from nerf_tpu.core.encoding import positional_encoding

    cfg_xla, _, nerf, params, pos, dirs = _setup()
    r, p = pos.shape[:2]
    n = r * p
    pos_f = pos.reshape(n, 3)
    dirs3 = dirs.reshape(n, 3).T  # the kernel takes ROW-LAND (3, N) dirs
    enc = jnp.concatenate(
        [pos_f, positional_encoding(pos_f, nerf.pos_levels)], axis=-1)
    noise = jnp.zeros((n, nerf.bottleneck_dim), jnp.float32)

    def run(prm):
        fused = ops.make_ref_fused(jnp.float32, 64, interpret=True,
                                   need_grad=True, ide_level=nerf.ide_level,
                                   use_srgb=False)
        ws = (ops.ref_spatial_weights_from_params(prm)
              + ops.ref_directional_weights_from_params(prm))
        rgb, density, normal, dgrad = fused(ws, enc, dirs3, noise,
                                            pos=pos_f)
        return rgb, density, normal, dgrad

    rgb, density, normal, dgrad = run(params)
    o_rgb, o_den, o_nor, o_grad = _ref_fine_forward(
        nerf, params, pos, dirs, None, train=False, need_grad=True,
        cfg=cfg_xla)
    # kernel rgb is ROW-LAND (3, N); oracle emits (3, R, P)
    np.testing.assert_allclose(np.asarray(rgb).reshape(3, r, p),
                               np.asarray(o_rgb), atol=2e-5)
    np.testing.assert_allclose(np.asarray(density).reshape(r, p),
                               np.asarray(o_den), atol=2e-5)
    # kernel normals/targets are ROW-LAND (3, N); oracle emits (3, R, P)
    np.testing.assert_allclose(np.asarray(normal).reshape(3, r, p),
                               np.asarray(o_nor), atol=2e-5)
    # the in-kernel density-grad finish (PE transpose + normalize) vs the
    # oracle's jax.vjp-over-flax targets
    np.testing.assert_allclose(np.asarray(dgrad).reshape(3, r, p),
                               np.asarray(o_grad), atol=2e-5)

    def loss_k(prm):
        rgb, density, normal, _ = run(prm)
        return (jnp.sum(rgb ** 2) + jnp.sum(jax.nn.softplus(density + 0.5))
                + jnp.sum(normal ** 2))

    def loss_x(prm):
        rgb, density, normal, _ = _ref_fine_forward(
            nerf, prm, pos, dirs, None, train=False, need_grad=True,
            cfg=cfg_xla)
        return (jnp.sum(rgb ** 2) + jnp.sum(jax.nn.softplus(density + 0.5))
                + jnp.sum(normal ** 2))

    gk = jax.grad(loss_k)(params)
    gx = jax.grad(loss_x)(params)
    fk, _ = jax.flatten_util.ravel_pytree(gk)
    fx, _ = jax.flatten_util.ravel_pytree(gx)
    np.testing.assert_allclose(np.asarray(fk), np.asarray(fx), rtol=5e-3,
                               atol=2e-4)


@pytest.mark.parametrize("use_srgb", [False, True])
def test_ref_store_residuals_matches_recompute(use_srgb):
    """The residual-storing directional backward (stored trunk activations +
    hand chain rule, _make_dir_bwd_res_kernel) vs the recompute/jax.vjp form:
    identical forward values and matching parameter grads + dheads through a
    loss touching rgb, normal, AND density (the passthrough cotangent)."""
    from nerf_tpu import ops
    from nerf_tpu.core.encoding import positional_encoding

    cfg_xla, _, nerf, params, pos, dirs = _setup(use_srgb)
    r, p = pos.shape[:2]
    n = r * p
    pos_f = pos.reshape(n, 3)
    dirs3 = dirs.reshape(n, 3).T
    enc = jnp.concatenate(
        [pos_f, positional_encoding(pos_f, nerf.pos_levels)], axis=-1)
    rng = np.random.default_rng(11)
    noise = jnp.asarray(
        rng.normal(0, 0.02, (n, nerf.bottleneck_dim)).astype(np.float32))
    ws = (ops.ref_spatial_weights_from_params(params)
          + ops.ref_directional_weights_from_params(params))

    def loss(w, store):
        fused = ops.make_ref_fused(jnp.float32, 64, interpret=True,
                                   need_grad=True, ide_level=nerf.ide_level,
                                   use_srgb=use_srgb, store_residuals=store)
        rgb, density, normal, _ = fused(w, enc, dirs3, noise, pos=pos_f)
        return (jnp.sum(rgb ** 2) + jnp.sum(jax.nn.softplus(density + 0.5))
                + jnp.sum(normal ** 2))

    l_rec, g_rec = jax.value_and_grad(lambda w: loss(w, False))(ws)
    l_res, g_res = jax.value_and_grad(lambda w: loss(w, True))(ws)
    np.testing.assert_allclose(float(l_res), float(l_rec), rtol=1e-6)
    for i, (a, b) in enumerate(zip(g_res, g_rec)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-5, err_msg=f"grad ws[{i}]")


def test_ref_train_pipeline_fused_matches_xla():
    """Whole render_rays_train on the ref model: fused vs XLA, values+grads."""
    from nerf_tpu.train.step import compute_loss

    cfg_base = dict(model="ref", ray_batch=8, n_coarse=8, n_fine=16,
                    nerf_width=32, prop_width=32, pallas_tile=64,
                    bottleneck_noise=0.0)  # noise off: streams differ
    cfg_xla = PipelineConfig(use_pallas=False, **cfg_base)
    cfg_fused = PipelineConfig(use_pallas=True, **cfg_base)
    models_x = make_models(cfg_xla)
    models_f = make_models(cfg_fused)
    params = init_variables(cfg_xla, jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    rays = jnp.asarray(np.concatenate([
        np.zeros((8, 3), np.float32),
        (rng.normal(0, 0.1, (8, 3)) + [0, 0, -1]).astype(np.float32),
    ], axis=-1))
    rgb_gt = jnp.asarray(rng.uniform(size=(8, 3)).astype(np.float32))
    key = jax.random.PRNGKey(11)

    def loss_fn(p, models, cfg):
        loss, metrics = compute_loss(models, p, rays, rgb_gt, key, cfg)
        return loss

    lx, gx = jax.value_and_grad(lambda p: loss_fn(p, models_x, cfg_xla))(params)
    lf, gf = jax.value_and_grad(lambda p: loss_fn(p, models_f, cfg_fused))(params)
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-4)
    flat_x, _ = jax.flatten_util.ravel_pytree(gx)
    flat_f, _ = jax.flatten_util.ravel_pytree(gf)
    np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_x),
                               rtol=5e-3, atol=3e-4)


def test_atan2_poly_accuracy_and_grad_safety():
    """_atan2_poly vs numpy across all quadrants/axes; finite grads at the
    origin (padded rows are exactly (0, 0))."""
    from nerf_tpu.ops.ref_fused import _atan2_poly

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(0, 2, (5000, 1)).astype(np.float32))
    x = jnp.asarray(rng.normal(0, 2, (5000, 1)).astype(np.float32))
    got = np.asarray(_atan2_poly(y, x))
    want = np.arctan2(np.asarray(y), np.asarray(x))
    np.testing.assert_allclose(got, want, atol=2e-6)

    # axes and origin
    pts = jnp.asarray([[0.0, 1.0], [0.0, -1.0], [1.0, 0.0], [-1.0, 0.0],
                       [0.0, 0.0]], jnp.float32)
    got = np.asarray(_atan2_poly(pts[:, 0:1], pts[:, 1:2]))[:, 0]
    want = np.arctan2(np.asarray(pts[:, 0]), np.asarray(pts[:, 1]))
    np.testing.assert_allclose(got[:4], want[:4], atol=2e-6)
    assert np.isfinite(got[4])

    # zero cotangent at the origin stays zero (no NaN/Inf leaks)
    def f(v):
        return jnp.sum(_atan2_poly(v[:, 0:1], v[:, 1:2]) * jnp.zeros((1, 1)))

    g = np.asarray(jax.grad(f)(jnp.zeros((3, 2), jnp.float32)))
    assert np.all(g == 0.0)


def test_ide_hand_vjp_matches_auto():
    """The algebraic complex-derivative backward (d(x+iy)^m = m(x+iy)^{m-1},
    d(z^i) = i z^{i-1}) must agree with the jax.vjp-derived chain through
    the polar forward to fp32 accuracy — identical forwards, mathematically
    equal backwards."""
    from nerf_tpu.core.encoding import ide_tables
    from nerf_tpu.ops.ref_fused import _ide_pure_rowland

    tables = ide_tables(4)
    l_max = int(tables["l_max"])
    mat = jnp.asarray(np.asarray(tables["mat"], np.float32))
    sigma_col = jnp.asarray(
        np.asarray(tables["sigma"], np.float32).reshape(-1, 1))

    rng = np.random.default_rng(11)
    t = 96
    xyz = rng.normal(0, 1, (3, t)).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=0, keepdims=True)
    # include exact-zero padded columns (grad-safety at pads)
    xyz[:, -8:] = 0.0
    kinv = np.abs(rng.normal(0, 0.3, (1, t))).astype(np.float32)
    kinv[:, -8:] = 0.0
    xyzT, kinvT = jnp.asarray(xyz), jnp.asarray(kinv)
    # zero cotangents at the padded columns — the kernel reality (padded
    # rows never receive gradient).  At non-padded singular points the two
    # backwards legitimately differ: auto differentiates the CLAMPED polar
    # forward (zero slope at the clamp), hand gives the true analytic
    # derivative (d(x+iy)^1/dx = 1 even at the origin).
    cot = rng.normal(0, 1, (38, t)).astype(np.float32)
    cot[:, -8:] = 0.0
    cot = jnp.asarray(cot)

    def run(hand):
        f = lambda a, k: _ide_pure_rowland(a, k, mat, sigma_col, l_max,
                                           hand_vjp=hand)
        out, vjp = jax.vjp(f, xyzT, kinvT)
        return out, vjp(cot)

    out_a, (dxyz_a, dk_a) = run(False)
    out_h, (dxyz_h, dk_h) = run(True)
    # forwards differ in bits only: the hand path computes the complex
    # powers by recurrence, the auto path by the polar exp/log/atan2 form
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_h),
                               rtol=5e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(dxyz_h), np.asarray(dxyz_a),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk_h), np.asarray(dk_a),
                               rtol=2e-4, atol=2e-4)
    # padded zero columns must stay exactly zero-grad (no NaN leakage)
    assert np.all(np.asarray(dxyz_h)[:, -8:] == 0.0)


def test_ref_train_pipeline_pe_doubling_matches_xla():
    """Ref pipeline with the angle-doubling spatial PE (cfg.pe_doubling):
    fused vs XLA values+grads at the PE error bound (fastmath
    .positional_encoding_dbl ~6e-5 on enc)."""
    from nerf_tpu.train.step import compute_loss

    cfg_base = dict(model="ref", ray_batch=8, n_coarse=8, n_fine=16,
                    nerf_width=32, prop_width=32, pallas_tile=64,
                    bottleneck_noise=0.0)  # noise off: streams differ
    cfg_xla = PipelineConfig(use_pallas=False, **cfg_base)
    cfg_dbl = PipelineConfig(use_pallas=True, pe_doubling=True, **cfg_base)
    models_x = make_models(cfg_xla)
    models_f = make_models(cfg_dbl)
    params = init_variables(cfg_xla, jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    rays = jnp.asarray(np.concatenate([
        np.zeros((8, 3), np.float32),
        (rng.normal(0, 0.1, (8, 3)) + [0, 0, -1]).astype(np.float32),
    ], axis=-1))
    rgb_gt = jnp.asarray(rng.uniform(size=(8, 3)).astype(np.float32))
    key = jax.random.PRNGKey(11)

    def loss_fn(p, models, cfg):
        loss, metrics = compute_loss(models, p, rays, rgb_gt, key, cfg)
        return loss

    lx, gx = jax.value_and_grad(lambda p: loss_fn(p, models_x, cfg_xla))(params)
    lf, gf = jax.value_and_grad(lambda p: loss_fn(p, models_f, cfg_dbl))(params)
    np.testing.assert_allclose(float(lf), float(lx), rtol=2e-4)
    flat_x, _ = jax.flatten_util.ravel_pytree(gx)
    flat_f, _ = jax.flatten_util.ravel_pytree(gf)
    np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_x),
                               rtol=5e-3, atol=3e-4)
