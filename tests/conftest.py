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

# Central slow-marking so `pytest -m "not slow"` is a quick (<~90s on the
# 1-CPU CI box) pre-commit gate; the full suite (~13 min) remains the real
# gate before milestones.  Durations measured 2026-08-16 (pytest_full.log).
SLOW_MODULES = {
    "tests.test_cli",
    "tests.test_ipe_mode",
    "tests.test_mip_model",
    "tests.test_multiprocess",
    "tests.test_ops",
    "tests.test_parallel",
    "tests.test_parallel_convergence",
    "tests.test_parallel_pallas",
    "tests.test_pipeline_pallas",
    "tests.test_properties",
    "tests.test_ref_fused",
    "tests.test_renderer",
    "tests.test_resume_determinism",
    "tests.test_specular_scene",
    "tests.test_torch_parity",
    "tests.test_trajectory_parity",
}
SLOW_TESTS = {
    "test_vanilla_fits_objects_scene",
    "test_ref_model_loss_and_grads_finite",
    "test_vanilla_training_reduces_loss",
    "test_epoch_scan_matches_step_loop",
    "test_regularizer_flags_change_loss",
    "test_train_step_deterministic",
    "test_refnerf_shapes",
    "test_refnerf_eval_deterministic_train_noisy",
    "test_vanilla_rgb_in_unit_range",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = getattr(item.module, "__name__", "")
        mod = mod if mod.startswith("tests.") else f"tests.{mod}"
        if mod in SLOW_MODULES or item.originalname in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


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
