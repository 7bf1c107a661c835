"""Tests for stratified / inverse-CDF sampling, merge, maxblur, bounds."""

import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.core import sampling
from tests.conftest import gaussian_weight_fixture


def test_stratified_samples_in_interval():
    key = jax.random.PRNGKey(0)
    z = np.asarray(sampling.stratified_samples(key, 16, 64, 2.0, 6.0))
    res = 4.0 / 64
    base = np.linspace(2.0, 6.0 - res, 64)
    assert z.shape == (16, 64)
    assert np.all(z >= base[None, :]) and np.all(z <= base[None, :] + res)
    # strictly increasing per ray (interval-disjoint)
    assert np.all(np.diff(z, axis=-1) > 0)


def test_count_le_matches_searchsorted(rng):
    vals = np.sort(rng.standard_normal((5, 63)).astype(np.float32), axis=-1)
    q = rng.standard_normal((5, 129)).astype(np.float32)
    got = np.asarray(sampling.count_le(jnp.asarray(vals), jnp.asarray(q)))
    want = np.stack([np.searchsorted(v, qq, side="right") for v, qq in zip(vals, q)])
    np.testing.assert_array_equal(got, want)
    got_lt = np.asarray(sampling.count_lt(jnp.asarray(vals), jnp.asarray(q)))
    want_lt = np.stack([np.searchsorted(v, qq, side="left") for v, qq in zip(vals, q)])
    np.testing.assert_array_equal(got_lt, want_lt)


def np_sample_pdf(bins, weights, u):
    """Independent numpy inverse-CDF (mirrors reference utils.py:108-133)."""
    w = weights + 1e-5
    pdf = w / w.sum(-1, keepdims=True)
    cdf = np.cumsum(pdf, -1)
    cdf = np.concatenate([np.zeros_like(cdf[..., :1]), cdf], -1)
    inds = np.stack([np.searchsorted(c, uu, side="right") for c, uu in zip(cdf, u)])
    below = np.maximum(0, inds - 1)
    above = np.minimum(cdf.shape[-1] - 1, inds)
    cdf_b = np.take_along_axis(cdf, below, -1)
    cdf_a = np.take_along_axis(cdf, above, -1)
    bins_b = np.take_along_axis(bins, below, -1)
    bins_a = np.take_along_axis(bins, above, -1)
    denom = np.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b), below, above


def test_sample_pdf_matches_numpy_oracle():
    weights = gaussian_weight_fixture(8, 64)[:, 1:-1]
    bins = np.linspace(2.0, 6.0, 63, dtype=np.float32)[None].repeat(8, 0)
    # explicit uniforms so the jax path and the numpy oracle see identical u
    u = np.random.default_rng(5).uniform(size=(8, 129)).astype(np.float32)
    samples, below, above = sampling.sample_pdf(
        None, jnp.asarray(bins), jnp.asarray(weights), 129, u=jnp.asarray(u)
    )
    want_s, want_b, want_a = np_sample_pdf(bins, weights, u)
    np.testing.assert_allclose(np.asarray(samples), want_s, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(below), want_b)
    np.testing.assert_array_equal(np.asarray(above), want_a)


def test_sample_pdf_concentrates_mass():
    """Samples should land where the weight profile peaks (around z=4)."""
    weights = gaussian_weight_fixture(32, 64, sigma_factor=0.05)
    z = np.linspace(2.0, 6.0, 64, dtype=np.float32)[None].repeat(32, 0)
    key = jax.random.PRNGKey(7)
    samples = sampling.inverse_sample(key, jnp.asarray(weights), jnp.asarray(z), 128)
    s = np.asarray(samples)
    assert np.abs(np.median(s) - 4.0) < 0.25
    frac_near_peak = np.mean(np.abs(s - 4.0) < 0.8)
    assert frac_near_peak > 0.8


def test_inverse_sample_sorted_bookkeeping():
    weights = gaussian_weight_fixture(4, 64)
    z = np.linspace(2.0, 6.0, 64, dtype=np.float32)[None].repeat(4, 0)
    key = jax.random.PRNGKey(11)
    z_s, below = sampling.inverse_sample(key, jnp.asarray(weights), jnp.asarray(z), 129, sort=True)
    z_s, below = np.asarray(z_s), np.asarray(below)
    assert np.all(np.diff(z_s, axis=-1) >= 0)
    # below indices must be monotone when samples are sorted
    assert np.all(np.diff(below, axis=-1) >= 0)
    assert below.min() >= 0 and below.max() <= 61


def test_max_blur_filter_golden():
    w = jnp.asarray([[1.0, 3.0, 2.0, 0.0]])
    got = np.asarray(sampling.max_blur_filter(w, 0.01))
    # maxi = [3, 3, 2]; front = [1, 3, 3, 2]; rear = [3, 3, 2, 0]
    want = 0.5 * np.array([[4.0, 6.0, 5.0, 2.0]]) + 0.01
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_weight_bounds_golden():
    w = jnp.asarray([[0.1, 0.2, 0.3, 0.4]])
    idx = jnp.asarray([[0, 1, 3]])
    got = np.asarray(sampling.weight_bounds(w, idx))
    # sat = [0, .1, .3, .6, 1.0]; starts=[0,1], ends=[2,4]
    # bounds = [sat[2]-sat[0], sat[4]-sat[1]] = [0.3, 0.9]
    np.testing.assert_allclose(got, [[0.3, 0.9]], atol=1e-6)


def test_merge_rank_vs_sort_oracle(rng):
    r, nc, nf = 16, 64, 129
    c_z = np.sort(rng.uniform(2, 6, (r, nc)).astype(np.float32), -1)
    f_z = np.sort(rng.uniform(2.2, 5.5, (r, nf)).astype(np.float32), -1)
    f_idx = np.sort(rng.integers(0, 62, (r, nf)).astype(np.int32), -1)

    z1, src1, coarse_pos, idx1 = sampling.merge_coarse_fine(
        jnp.asarray(c_z), jnp.asarray(f_z), jnp.asarray(f_idx)
    )
    z2, src2, idx2 = sampling.merge_coarse_fine_via_sort(
        jnp.asarray(c_z), jnp.asarray(f_z), jnp.asarray(f_idx)
    )
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=0)
    np.testing.assert_array_equal(np.asarray(src1), np.asarray(src2))
    np.testing.assert_array_equal(np.asarray(idx1), np.asarray(idx2))

    # coarse_pos: merged[coarse_pos[j]] == c_z[j] for kept positions
    z_full = np.concatenate([np.asarray(z1), np.full((r, 1), np.inf, np.float32)], -1)
    cp = np.asarray(coarse_pos)
    kept = cp < nc + nf - 1
    np.testing.assert_allclose(
        np.take_along_axis(z_full, cp, -1)[kept], c_z[kept], atol=0
    )
    # the largest coarse sample is always the dropped one when it exceeds all fine
    assert np.all(cp[:, -1] == nc + nf - 1)


def test_fused_select_matches_matmul_oracle(rng):
    """select='fused' (default, no (R,N,M) materialization) must agree with
    the round-1 one-hot matmul path in values AND gradients."""
    r, p, k = 8, 64, 129
    weights = gaussian_weight_fixture(r, p)
    z = np.linspace(2.0, 6.0, p, dtype=np.float32)[None].repeat(r, 0)
    u = np.sort(rng.uniform(size=(r, k)).astype(np.float32), -1)
    bins = 0.5 * (z[:, 1:] + z[:, :-1])

    for sel in ("fused", "matmul"):
        out = sampling.sample_pdf(None, jnp.asarray(bins),
                                  jnp.asarray(weights[:, 1:-1]), k,
                                  u=jnp.asarray(u), select=sel)
        if sel == "fused":
            s_f, b_f, a_f = map(np.asarray, out)
        else:
            s_m, b_m, a_m = map(np.asarray, out)
    np.testing.assert_allclose(s_f, s_m, atol=1e-6)
    np.testing.assert_array_equal(b_f, b_m)
    np.testing.assert_array_equal(a_f, a_m)

    # weight_bounds: values and grad w.r.t. prop weights (the proposal-loss
    # backward is the path the one-hot transpose was built for)
    idx = np.sort(rng.integers(0, p - 2, (r, k)).astype(np.int32), -1)

    def total(w, sel):
        return jnp.sum(sampling.weight_bounds(w, jnp.asarray(idx), select=sel) ** 2)

    w_j = jnp.asarray(weights)
    for sel in ("fused", "matmul"):
        v, g = jax.value_and_grad(lambda w: total(w, sel))(w_j)
        if sel == "fused":
            v_f, g_f = float(v), np.asarray(g)
        else:
            v_m, g_m = float(v), np.asarray(g)
    np.testing.assert_allclose(v_f, v_m, rtol=1e-6)
    np.testing.assert_allclose(g_f, g_m, atol=1e-6)

    # merge_coarse_fine: both selects against each other and grads through z
    nc, nf = 64, 129
    c_z = np.sort(rng.uniform(2, 6, (r, nc)).astype(np.float32), -1)
    f_z = np.sort(rng.uniform(2.2, 5.5, (r, nf)).astype(np.float32), -1)
    f_idx = np.sort(rng.integers(0, 62, (r, nf)).astype(np.int32), -1)

    def merged_sum(cz, fz, sel):
        zm, _, _, _ = sampling.merge_coarse_fine(cz, fz, jnp.asarray(f_idx),
                                                 select=sel)
        return jnp.sum(zm ** 2)

    for sel in ("fused", "matmul"):
        z_out = sampling.merge_coarse_fine(jnp.asarray(c_z), jnp.asarray(f_z),
                                           jnp.asarray(f_idx), select=sel)
        g = jax.grad(merged_sum, argnums=(0, 1))(
            jnp.asarray(c_z), jnp.asarray(f_z), sel)
        if sel == "fused":
            zf, sf, cpf, idf = map(np.asarray, z_out)
            gc_f, gf_f = map(np.asarray, g)
        else:
            zm, sm, cpm, idm = map(np.asarray, z_out)
            gc_m, gf_m = map(np.asarray, g)
    np.testing.assert_allclose(zf, zm, atol=0)
    np.testing.assert_array_equal(sf, sm)
    np.testing.assert_array_equal(cpf, cpm)
    np.testing.assert_array_equal(idf, idm)
    np.testing.assert_allclose(gc_f, gc_m, atol=1e-6)
    np.testing.assert_allclose(gf_f, gf_m, atol=1e-6)


def test_merge_tie_stability():
    """On equal z, fine entries sort before coarse (torch stable-sort parity)."""
    c_z = jnp.asarray([[1.0, 2.0]])
    f_z = jnp.asarray([[2.0, 3.0]])
    z, src, _ = sampling.merge_coarse_fine(c_z, f_z)
    # cat order is (fine, coarse): fine 2.0 has cat index 0, coarse 2.0 index 3
    np.testing.assert_allclose(np.asarray(z), [[1.0, 2.0, 2.0]])
    np.testing.assert_array_equal(np.asarray(src), [[2, 0, 3]])
