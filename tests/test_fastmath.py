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
