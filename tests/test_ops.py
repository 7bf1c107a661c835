"""Fused Pallas MLP kernels vs the flax/XLA oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_tpu.core.encoding import positional_encoding
from nerf_tpu.models import ProposalNetwork, VanillaNeRF
from nerf_tpu.ops import (
    make_prop_fused, make_vanilla_fused, prop_weights_from_params,
    vanilla_weights_from_params,
)

POS_L, DIR_L = 4, 2  # small encodings keep interpret mode fast
N, TILE = 70, 32     # deliberately not a multiple of the tile


def _encode(pos, dirs):
    dirs_n = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    enc_x = jnp.concatenate([pos, positional_encoding(pos, POS_L)], axis=-1)
    enc_d = jnp.concatenate([dirs_n, positional_encoding(dirs_n, DIR_L)], axis=-1)
    return enc_x, enc_d


@pytest.fixture(scope="module")
def vanilla_setup():
    model = VanillaNeRF(pos_levels=POS_L, dir_levels=DIR_L, hidden=48,
                        bottleneck=40, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    pos = jax.random.normal(jax.random.PRNGKey(1), (N, 1, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(2), (N, 1, 3)) + 0.1
    params = model.init(key, pos, dirs)["params"]
    return model, params, pos, dirs


@pytest.fixture(scope="module")
def prop_setup():
    model = ProposalNetwork(pos_levels=POS_L, hidden=48, dtype=jnp.float32)
    pos = jax.random.normal(jax.random.PRNGKey(3), (N, 1, 3))
    params = model.init(jax.random.PRNGKey(4), pos)["params"]
    return model, params, pos


class TestVanillaFused:
    def test_forward_matches_flax(self, vanilla_setup):
        model, params, pos, dirs = vanilla_setup
        rgb_ref, sigma_ref = model.apply({"params": params}, pos, dirs)
        enc_x, enc_d = _encode(pos[:, 0], dirs[:, 0])
        fused = make_vanilla_fused(jnp.float32, TILE, interpret=True)
        rgb, sigma = fused(vanilla_weights_from_params(params), enc_x, enc_d)
        # the kernel emits ROW-LAND (3, N) rgb
        np.testing.assert_allclose(rgb.T, rgb_ref[:, 0], rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(sigma, sigma_ref[:, 0], rtol=2e-5, atol=2e-6)

    def test_param_grads_match_flax(self, vanilla_setup):
        model, params, pos, dirs = vanilla_setup
        g_rgb = jax.random.normal(jax.random.PRNGKey(5), (N, 3))
        g_sig = jax.random.normal(jax.random.PRNGKey(6), (N,))
        enc_x, enc_d = _encode(pos[:, 0], dirs[:, 0])
        fused = make_vanilla_fused(jnp.float32, TILE, interpret=True)

        def loss_ref(p):
            rgb, sigma = model.apply({"params": p}, pos, dirs)
            return jnp.sum(rgb[:, 0] * g_rgb) + jnp.sum(sigma[:, 0] * g_sig)

        def loss_fused(p):
            rgb, sigma = fused(vanilla_weights_from_params(p), enc_x, enc_d)
            return jnp.sum(rgb * g_rgb.T) + jnp.sum(sigma * g_sig)

        gr = jax.grad(loss_ref)(params)
        gf = jax.grad(loss_fused)(params)
        flat_r = jax.tree_util.tree_leaves_with_path(gr)
        flat_f = {jax.tree_util.keystr(k): v
                  for k, v in jax.tree_util.tree_leaves_with_path(gf)}
        for k, v in flat_r:
            ks = jax.tree_util.keystr(k)
            np.testing.assert_allclose(
                flat_f[ks], v, rtol=2e-4, atol=2e-5, err_msg=ks)

    def test_store_residuals_variant_matches_recompute(self, vanilla_setup):
        """The residual-storing backward (activations streamed from HBM)
        must produce the same outputs and parameter grads as the default
        recompute-form backward — same math, different residency."""
        model, params, pos, dirs = vanilla_setup
        g_rgb = jax.random.normal(jax.random.PRNGKey(5), (N, 3))
        g_sig = jax.random.normal(jax.random.PRNGKey(6), (N,))
        enc_x, enc_d = _encode(pos[:, 0], dirs[:, 0])
        ws = vanilla_weights_from_params(params)

        def run(store):
            fused = make_vanilla_fused(jnp.float32, TILE, interpret=True,
                                       store_residuals=store)

            def loss(w):
                rgb, sigma = fused(w, enc_x, enc_d)
                return jnp.sum(rgb * g_rgb.T) + jnp.sum(sigma * g_sig)

            (rgb, sigma) = fused(ws, enc_x, enc_d)
            return rgb, sigma, jax.grad(loss)(ws)

        rgb_a, sig_a, g_a = run(False)
        rgb_b, sig_b, g_b = run(True)
        np.testing.assert_array_equal(np.asarray(rgb_a), np.asarray(rgb_b))
        np.testing.assert_array_equal(np.asarray(sig_a), np.asarray(sig_b))
        for i, (ga, gb) in enumerate(zip(g_a, g_b)):
            np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                                       rtol=1e-5, atol=1e-6, err_msg=str(i))

    def test_bf16_forward_close(self, vanilla_setup):
        model, params, pos, dirs = vanilla_setup
        rgb_ref, _ = model.apply({"params": params}, pos, dirs)
        enc_x, enc_d = _encode(pos[:, 0], dirs[:, 0])
        fused = make_vanilla_fused(jnp.bfloat16, TILE, interpret=True)
        rgb, _ = fused(vanilla_weights_from_params(params), enc_x, enc_d)
        assert rgb.dtype == jnp.float32
        np.testing.assert_allclose(rgb.T, rgb_ref[:, 0], rtol=0.05, atol=0.02)


class TestPropFused:
    def test_forward_matches_flax(self, prop_setup):
        model, params, pos = prop_setup
        ref = model.apply({"params": params}, pos)
        enc = jnp.concatenate(
            [pos[:, 0], positional_encoding(pos[:, 0], POS_L)], axis=-1)
        fused = make_prop_fused(jnp.float32, TILE, interpret=True)
        out = fused(prop_weights_from_params(params), enc)
        np.testing.assert_allclose(out, ref[:, 0], rtol=2e-5, atol=2e-6)

    def test_param_grads_match_flax(self, prop_setup):
        model, params, pos = prop_setup
        g = jax.random.normal(jax.random.PRNGKey(7), (N,))
        enc = jnp.concatenate(
            [pos[:, 0], positional_encoding(pos[:, 0], POS_L)], axis=-1)
        fused = make_prop_fused(jnp.float32, TILE, interpret=True)

        def loss_ref(p):
            return jnp.sum(model.apply({"params": p}, pos)[:, 0] * g)

        def loss_fused(p):
            return jnp.sum(fused(prop_weights_from_params(p), enc) * g)

        gr = jax.grad(loss_ref)(params)
        gf = jax.grad(loss_fused)(params)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5),
            gr, gf)

    def test_store_residuals_variant_matches_recompute(self, prop_setup):
        model, params, pos = prop_setup
        g = jax.random.normal(jax.random.PRNGKey(8), (N,))
        enc = jnp.concatenate(
            [pos[:, 0], positional_encoding(pos[:, 0], POS_L)], axis=-1)
        ws = prop_weights_from_params(params)

        def run(store):
            fused = make_prop_fused(jnp.float32, TILE, interpret=True,
                                    store_residuals=store)
            out = fused(ws, enc)
            grads = jax.grad(lambda w: jnp.sum(fused(w, enc) * g))(ws)
            return out, grads

        out_a, g_a = run(False)
        out_b, g_b = run(True)
        np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
        for i, (ga, gb) in enumerate(zip(g_a, g_b)):
            np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                                       rtol=1e-5, atol=1e-6, err_msg=str(i))

