"""Shared MLP building blocks.

Initialization parity with the reference (nerf_base.py:14-22 /
addtional.py:55-60): truncated-normal(std=0.02) kernels, zero biases.

Mixed precision: ``dtype`` is the compute dtype (bf16 on TPU for the vanilla
path); ``param_dtype`` stays float32 — the TPU-native replacement for the
reference's APEX AMP (README.md:127).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

trunc_init = nn.initializers.truncated_normal(stddev=0.02)


class Dense(nn.Dense):
    """nn.Dense with the reference's init defaults baked in."""

    kernel_init: nn.initializers.Initializer = trunc_init
    bias_init: nn.initializers.Initializer = nn.initializers.zeros


class MLP(nn.Module):
    """Stack of Dense+ReLU layers; the last layer's activation is configurable.

    features: output width of each layer.
    final_act: None (linear), "relu", or "sigmoid" for the last layer
    (intermediate layers are always ReLU, matching makeMLP,
    nerf_helper.py:17-23).
    """

    features: Sequence[int]
    final_act: str | None = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n = len(self.features)
        for i, width in enumerate(self.features):
            x = Dense(width, dtype=self.dtype, param_dtype=jnp.float32)(x)
            act = self.final_act if i == n - 1 else "relu"
            if act == "relu":
                x = nn.relu(x)
            elif act == "sigmoid":
                x = nn.sigmoid(x)
            elif act is not None:
                raise ValueError(f"unknown activation {act!r}")
        return x
