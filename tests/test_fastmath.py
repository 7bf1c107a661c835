"""Tests for the TPU-layout math reformulations against naive forms."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy import stats

from nerf_tpu.core import fastmath
from nerf_tpu.core.encoding import positional_encoding, positional_encoding_ref


def test_pe_matmul_matches_loop_form(rng):
    x = rng.standard_normal((64, 3)).astype(np.float32) * 2
    got = np.asarray(positional_encoding(jnp.asarray(x), 10))
    want = np.asarray(positional_encoding_ref(jnp.asarray(x), 10))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_pe_doubling_matches_loop_form(rng):
    """Angle-doubling PE == oracle within the 2^l-amplified ulp bound.

    Inputs span the real PE range (scene coords up to ~|4|); the doubling
    error bound is ~2^(L-1) * ulp(1) ~ 6e-5 at L=10 — asserted with ~3x
    headroom, still two decades under the bf16 quantization of the
    consumers (the fused kernels' enc operand)."""
    x = (rng.standard_normal((64, 3)) * 4).astype(np.float32)
    got = np.asarray(fastmath.positional_encoding_dbl(jnp.asarray(x), 10))
    want = np.asarray(positional_encoding_ref(jnp.asarray(x), 10))
    assert got.shape == want.shape == (64, 60)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_cat_pos_pe_doubling_matches_plain(rng):
    """cat_pos_pe(doubling=True) == the matmul+sin form at bf16 output
    precision (the only precision any consumer sees)."""
    x = (rng.standard_normal((37, 3)) * 4).astype(np.float32)
    plain = np.asarray(
        fastmath.cat_pos_pe(jnp.asarray(x), 10, jnp.bfloat16, doubling=False)
        .astype(jnp.float32))
    dbl = np.asarray(
        fastmath.cat_pos_pe(jnp.asarray(x), 10, jnp.bfloat16, doubling=True)
        .astype(jnp.float32))
    assert dbl.shape == plain.shape == (37, 63)
    np.testing.assert_array_equal(dbl[:, :3], x.astype(jnp.bfloat16))
    # bf16 grids: allow one-ulp flips where the f32 values straddle a
    # rounding boundary
    np.testing.assert_allclose(dbl, plain, atol=0.008, rtol=0.004)


def test_cumsum_mm_matches_cumsum(rng):
    x = rng.standard_normal((16, 130)).astype(np.float32)
    got = np.asarray(fastmath.cumsum_mm(jnp.asarray(x)))
    np.testing.assert_allclose(got, np.cumsum(x, -1), atol=1e-4)
    got_ex = np.asarray(fastmath.cumsum_mm(jnp.asarray(x), exclusive=True))
    want_ex = np.concatenate([np.zeros((16, 1)), np.cumsum(x, -1)[:, :-1]], -1)
    np.testing.assert_allclose(got_ex, want_ex, atol=1e-4)


def test_sorted_uniforms_are_sorted_and_uniform():
    u = np.asarray(fastmath.sorted_uniforms(jax.random.PRNGKey(0), (500, 129)))
    assert u.shape == (500, 129)
    assert np.all(np.diff(u, axis=-1) >= 0)
    assert np.all(u > 0) and np.all(u < 1)
    # pooled marginals must be U(0,1): KS test on a large pooled sample
    ks = stats.kstest(u.reshape(-1), "uniform")
    assert ks.pvalue > 1e-4, f"sorted uniforms not U(0,1): {ks}"


def test_interp_from_counts_matches_gather(rng):
    m, n = 63, 129
    vals = np.sort(rng.standard_normal((8, m)).astype(np.float32), -1)
    # sorted-vals role is a CDF starting at its minimum; emulate cdf[0] <= u
    u = rng.uniform(vals[:, :1], vals[:, -1:] + 0.5, (8, n)).astype(np.float32)
    le = (vals[:, None, :] <= u[:, :, None]).astype(np.float32)
    inds = le.sum(-1).astype(np.int64)
    below = np.maximum(0, inds - 1)
    above = np.minimum(m - 1, inds)
    got_b, got_a = fastmath.interp_from_counts(jnp.asarray(le), jnp.asarray(vals))
    np.testing.assert_allclose(np.asarray(got_b), np.take_along_axis(vals, below, -1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_a), np.take_along_axis(vals, above, -1), atol=1e-6)


def test_onehot_select_matches_gather(rng):
    """onehot_select == take_along_axis, exactly; grad w.r.t. values is the
    transpose one-hot reduce (checked against the explicit dense form)."""
    m, n = 65, 129
    vals = rng.standard_normal((8, m)).astype(np.float32)
    idx = rng.integers(0, m, (8, n)).astype(np.int32)
    got = np.asarray(fastmath.onehot_select(jnp.asarray(idx), jnp.asarray(vals)))
    want = np.take_along_axis(vals, idx.astype(np.int64), -1)
    np.testing.assert_array_equal(got, want)  # exact: single selected element

    def f(v):
        return jnp.sum(fastmath.onehot_select(jnp.asarray(idx), v) ** 2)

    g = np.asarray(jax.grad(f)(jnp.asarray(vals)))
    dense = np.zeros_like(vals)
    np.add.at(dense, (np.arange(8)[:, None], idx), 2.0 * want)
    np.testing.assert_allclose(g, dense, rtol=1e-6, atol=1e-6)
