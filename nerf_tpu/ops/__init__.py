"""Pallas TPU kernels for the hot path (+ XLA reference implementations).

The reference repo historically shipped a CUDA extension for its hot path —
"inverse transform sampling, image sampler, positional encoding module"
(/root/reference/README.md:56, :89-92) — which was removed upstream
(README.md:113). This package is its TPU-native successor: the dominant cost
in this pipeline is the per-point MLP evaluation (rays x samples x 8 dense
layers), which is HBM-bandwidth-bound under stock XLA because every 256-wide
layer round-trips its activations through HBM. The fused kernels here keep
the whole dense chain in VMEM per point-tile (weights resident, activations
never leaving the chip), with a custom-VJP backward that recomputes the
forward per tile and accumulates weight gradients across the sequential
grid.

Every kernel has the stock flax/XLA path as its correctness oracle
(tests/test_ops.py) and can be toggled off via PipelineConfig.use_pallas.
"""

import jax

from nerf_tpu.ops.fused_mlp import (
    make_prop_fused, make_vanilla_fused, prop_weights_from_params,
    vanilla_weights_from_params,
)
from nerf_tpu.ops.ref_fused import (
    make_ref_fused,
    ref_directional_weights_from_params, ref_spatial_weights_from_params,
)


def pallas_supported() -> bool:
    """True when the default backend can compile Pallas TPU kernels."""
    return jax.default_backend() not in ("cpu",)


__all__ = [
    "make_vanilla_fused", "make_prop_fused",
    "vanilla_weights_from_params", "prop_weights_from_params",
    "make_ref_fused",
    "ref_spatial_weights_from_params", "ref_directional_weights_from_params",
    "pallas_supported",
]
