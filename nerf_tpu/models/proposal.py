"""Proposal network (Mip-NeRF 360 style density-only MLP).

Capability parity (behavior, not code): /root/reference/nerf/addtional.py:53-96
— PE(pos, 10) + raw-position concat into a 5-layer MLP ending in a scalar
density per sample.  ``get_weights`` lives in core.render
(transmittance_weights with ray-norm scaling).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from nerf_tpu.core.encoding import positional_encoding
from nerf_tpu.models.mlp import MLP


class ProposalNetwork(nn.Module):
    pos_levels: int = 10
    hidden: int = 256
    cat_origin: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pos: jnp.ndarray) -> jnp.ndarray:
        """pos (R, P, 3) -> raw density (R, P).

        The caller applies softplus (train path, train.py:169) or relu inside
        the weight computation (eval path, procedures.py:67-68).
        """
        enc = positional_encoding(pos, self.pos_levels)
        if self.cat_origin:
            enc = jnp.concatenate([pos, enc], axis=-1)
        h = MLP([self.hidden] * 4, final_act="relu", dtype=self.dtype)(enc.astype(self.dtype))
        out = MLP([1], final_act=None, dtype=self.dtype)(h)
        return out[..., 0].astype(jnp.float32)
