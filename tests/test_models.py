"""Model shape / parameter-count / behavior tests."""

import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.models import ProposalNetwork, VanillaNeRF, RefNeRF


def _param_count(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def test_proposal_shapes_and_param_count():
    net = ProposalNetwork(pos_levels=10, hidden=256)
    pos = jnp.zeros((4, 64, 3))
    params = net.init(jax.random.PRNGKey(0), pos)
    out = net.apply(params, pos)
    assert out.shape == (4, 64)
    # 5 linears: 63->256, 256->256 x3, 256->1 (reference addtional.py:61-68)
    want = (63 * 256 + 256) + 3 * (256 * 256 + 256) + (256 * 1 + 1)
    assert _param_count(params) == want


def test_vanilla_shapes_and_param_count():
    net = VanillaNeRF()
    pos = jnp.zeros((2, 16, 3))
    dirs = jnp.ones((2, 16, 3))
    params = net.init(jax.random.PRNGKey(0), pos, dirs)
    rgb, sigma = net.apply(params, pos, dirs)
    assert rgb.shape == (2, 16, 3)
    assert sigma.shape == (2, 16)
    # mirror of mip_model.py:15-38 layer sizes
    want = (
        (63 * 256 + 256) + 3 * (256 * 256 + 256)          # block1
        + ((256 + 63) * 256 + 256) + 2 * (256 * 256 + 256)  # block2
        + (256 * 1 + 1)                                     # opacity head
        + (256 * 256 + 256)                                 # bottleneck
        + ((256 + 27) * 128 + 128) + (128 * 3 + 3)          # rgb layer
    )
    assert _param_count(params) == want


def test_vanilla_rgb_in_unit_range(rng):
    net = VanillaNeRF(hidden=32, bottleneck=32)
    pos = jnp.asarray(rng.standard_normal((2, 8, 3)), jnp.float32)
    dirs = jnp.asarray(rng.standard_normal((2, 8, 3)), jnp.float32)
    params = net.init(jax.random.PRNGKey(1), pos, dirs)
    rgb, _ = net.apply(params, pos, dirs)
    assert np.all(np.asarray(rgb) >= 0) and np.all(np.asarray(rgb) <= 1)


def test_refnerf_shapes(rng):
    net = RefNeRF(hidden=64, output_dim=64, bottleneck_dim=32)
    pos = jnp.asarray(rng.standard_normal((2, 8, 3)), jnp.float32)
    dirs = jnp.asarray(rng.standard_normal((2, 8, 3)), jnp.float32)
    params = net.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        pos, dirs, True,
    )
    rgb, density, normal = net.apply(
        params, pos, dirs, True, rngs={"noise": jax.random.PRNGKey(2)}
    )
    assert rgb.shape == (2, 8, 3)
    assert density.shape == (2, 8)
    assert normal.shape == (2, 8, 3)
    # predicted normals are unit length up to the reference's 1e-7 epsilon
    # (ref_model.py:87) — at init the raw head output is tiny, so allow slack
    norms = np.linalg.norm(np.asarray(normal), axis=-1)
    assert np.all(norms <= 1.0 + 1e-5) and np.all(norms > 0.9)


def test_refnerf_eval_deterministic_train_noisy(rng):
    net = RefNeRF(hidden=32, output_dim=32, bottleneck_dim=16, perturb_bottleneck=0.5)
    pos = jnp.asarray(rng.standard_normal((1, 4, 3)), jnp.float32)
    dirs = jnp.asarray(rng.standard_normal((1, 4, 3)), jnp.float32)
    params = net.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        pos, dirs, True,
    )
    eval1, _, _ = net.apply(params, pos, dirs, False)
    eval2, _, _ = net.apply(params, pos, dirs, False)
    np.testing.assert_array_equal(np.asarray(eval1), np.asarray(eval2))
    tr1, _, _ = net.apply(params, pos, dirs, True, rngs={"noise": jax.random.PRNGKey(2)})
    tr2, _, _ = net.apply(params, pos, dirs, True, rngs={"noise": jax.random.PRNGKey(3)})
    assert np.any(np.asarray(tr1) != np.asarray(tr2))


def test_refnerf_density_gradient_via_vjp(rng):
    """d(sigma)/d(pos) through the spatial trunk matches finite differences."""
    net = RefNeRF(hidden=32, output_dim=32, bottleneck_dim=16)
    pos = jnp.asarray(rng.standard_normal((1, 4, 3)), jnp.float32)
    params = net.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        pos, jnp.ones((1, 4, 3)), False,
    )

    def sigma_fn(p):
        return net.apply(params, p, method=RefNeRF.spatial)["density"]

    grad = jax.grad(lambda p: sigma_fn(p).sum())(pos)
    eps = 1e-3
    for k in range(3):
        dp = jnp.zeros_like(pos).at[0, 1, k].set(eps)
        fd = (sigma_fn(pos + dp).sum() - sigma_fn(pos - dp).sum()) / (2 * eps)
        np.testing.assert_allclose(float(grad[0, 1, k]), float(fd), atol=2e-2, rtol=2e-2)
