"""Golden tests for encodings against independent numpy implementations."""

import numpy as np
import jax.numpy as jnp
import pytest

from nerf_tpu.core import encoding


def np_positional_encoding(x: np.ndarray, levels: int) -> np.ndarray:
    """Loop-and-concat formulation, mirroring reference nerf_helper.py:38-48."""
    outs = []
    for fid in range(levels):
        f = 2.0**fid
        outs.append(np.sin(f * x))
        outs.append(np.cos(f * x))
    return np.concatenate(outs, axis=-1)


def test_positional_encoding_matches_loop_formulation(rng):
    x = rng.standard_normal((7, 5, 3)).astype(np.float32)
    got = np.asarray(encoding.positional_encoding(jnp.asarray(x), 10))
    want = np_positional_encoding(x, 10)
    assert got.shape == (7, 5, 60)
    # cos computed as sin(x + pi/2) differs from cos(x) by fp32 rounding
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_positional_encoding_golden_values():
    # hand-computed: x = [pi/2], level 2 -> [sin(pi/2), cos(pi/2), sin(pi), cos(pi)]
    x = jnp.asarray([[np.pi / 2]])
    got = np.asarray(encoding.positional_encoding(x, 2))[0]
    np.testing.assert_allclose(got, [1.0, 0.0, 0.0, -1.0], atol=1e-6)


def test_ide_matches_complex_formulation(rng):
    """Real-valued IDE vs the complex (x+iy)^m Vandermonde definition."""
    deg = 4
    xyz = rng.standard_normal((64, 3)).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    kappa_inv = rng.uniform(0.05, 1.0, (64, 1)).astype(np.float32)

    got = np.asarray(encoding.integrated_dir_enc(jnp.asarray(xyz), jnp.asarray(kappa_inv), deg))

    # independent complex-valued computation (numpy)
    tables = encoding.ide_tables(deg)
    mat = tables["mat"]
    ml = encoding._ml_array(deg)
    x, y, z = xyz[..., 0:1], xyz[..., 1:2], xyz[..., 2:3]
    vmz = np.concatenate([z**i for i in range(mat.shape[0])], axis=-1)
    vmxy = np.concatenate([(x + 1j * y) ** m for m in ml[0]], axis=-1)
    sph = vmxy * (vmz @ mat)
    sigma = 0.5 * ml[1] * (ml[1] + 1)
    ide = sph * np.exp(-sigma * kappa_inv)
    want = np.concatenate([np.real(ide), np.imag(ide)], axis=-1).astype(np.float32)

    assert got.shape == (64, encoding.ide_dim(deg))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_ide_dim_formula():
    # ref_model.py:30: ((1 << L) - 1 + L) << 1
    for deg in range(1, 6):
        tables = encoding.ide_tables(deg)
        assert 2 * tables["n_ch"] == encoding.ide_dim(deg)


def test_ide_deg_guard():
    with pytest.raises(ValueError):
        encoding.ide_tables(6)


def test_ipe_feature_shapes_and_attenuation(rng):
    """IPE: high variance must attenuate high-frequency features to ~0."""
    r, p, levels = 4, 8, 6
    zvals = np.sort(rng.uniform(2, 6, (r, p + 1)).astype(np.float32), axis=-1)
    rays = np.concatenate(
        [rng.standard_normal((r, 3)), rng.standard_normal((r, 3))], axis=-1
    ).astype(np.float32)
    feat, mu, mu_t = encoding.ipe_feature(jnp.asarray(zvals), jnp.asarray(rays), levels, r=5.0)
    assert feat.shape == (r, p, 6 * levels)
    assert mu.shape == (r, p, 3)
    assert mu_t.shape == (r, p)
    # huge cone radius -> high-frequency channels attenuated
    feat_hi = np.asarray(feat)[..., -6:]
    assert np.max(np.abs(feat_hi)) < 1e-2


def test_cone_parameters_degenerate_interval():
    """Equal-width tiny intervals: mu_t ~ midpoint, variances ~ 0."""
    z = jnp.asarray([[2.0, 2.001]])
    mu_t, s_t2, s_r2 = encoding.cone_parameters(z, r=0.01)
    np.testing.assert_allclose(np.asarray(mu_t), [[2.0005]], atol=1e-4)
    assert float(s_t2[0, 0]) < 1e-6


def test_linear_to_srgb_golden():
    lin = jnp.asarray([0.0, 0.0031308, 0.5, 1.0])
    got = np.asarray(encoding.linear_to_srgb(lin))
    # standard sRGB transfer values
    np.testing.assert_allclose(got[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(got[1], 12.92 * 0.0031308, atol=1e-5)
    np.testing.assert_allclose(got[2], 1.055 * 0.5 ** (1 / 2.4) - 0.055, atol=1e-3)
    np.testing.assert_allclose(got[3], 1.0, atol=1e-3)
