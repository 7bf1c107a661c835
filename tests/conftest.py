"""Test configuration: force an 8-device virtual CPU mesh before jax import.

Multi-chip sharding is validated on virtual CPU devices (no multi-chip TPU
hardware in CI); Pallas kernels run under interpret mode on CPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A site hook in this environment re-injects the TPU platform plugin after the
# env var is read; the config update below takes final precedence.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests expect an 8-device virtual CPU mesh"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def gaussian_weight_fixture(ray_num: int, coarse_pnum: int, sigma_factor: float = 0.1,
                            seed: int = 0) -> np.ndarray:
    """Per-ray Gaussian weight profiles for sampler tests.

    Port of the reference's test fixture generateTestSamples
    (/root/reference/nerf/utils.py:22-31): a Gaussian bump over [2, 6] plus
    small uniform noise, normalized per ray.
    """
    rng = np.random.default_rng(seed)
    x = np.linspace(2, 6, coarse_pnum)
    out = []
    for _ in range(ray_num):
        g = 1.0 / (np.sqrt(2 * np.pi) * 4 * sigma_factor) * np.exp(
            -((x - 4) ** 2) / (2 * (4 * sigma_factor) ** 2)
        )
        g = g + rng.uniform(0, np.mean(g) * 0.1, size=g.shape)
        g = g / np.sum(g)
        out.append(g)
    return np.stack(out).astype(np.float32)
