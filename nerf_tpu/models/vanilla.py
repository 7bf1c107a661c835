"""Vanilla NeRF MLP (the reference's misnamed "MipNeRF" fine network).

Capability parity (behavior, not code): /root/reference/nerf/mip_model.py:15-60
— PE(pos, 10) + raw concat -> 4-layer 256 block -> skip concat -> 3-layer
block -> {opacity head, 256-d bottleneck}; RGB head over
cat(bottleneck, dir-PE(4) + raw dir) with sigmoid.  Despite the class name the
reference computes no IPE in this forward path (README.md:95); this framework
keeps the architecture under an honest name and offers true IPE inputs via
``use_ipe`` (wired at the pipeline level).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from nerf_tpu.core.encoding import positional_encoding
from nerf_tpu.models.mlp import MLP, Dense


class VanillaNeRF(nn.Module):
    pos_levels: int = 10
    dir_levels: int = 4
    hidden: int = 256
    bottleneck: int = 256
    cat_origin: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pos: jnp.ndarray, dirs: jnp.ndarray,
                 enc_x: jnp.ndarray | None = None,
                 enc_d: jnp.ndarray | None = None):
        """pos (R, P, 3), dirs (R, P, 3) unnormalized -> (rgb (R,P,3), sigma (R,P)).

        sigma is raw (the composite applies relu, nerf_base.py:92 parity).
        ``enc_x`` overrides the internal frequency PE of ``pos`` with a
        precomputed position feature of the same width (the IPE path);
        ``enc_d`` likewise overrides the direction feature — callers whose
        dirs are per-ray constants broadcast over the P samples encode once
        per RAY and broadcast the finished encoding (bit-identical: same
        input bits per row -> same outputs; saves the (R*P, 27) PE complex).
        """
        if enc_d is None:
            dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
            enc_d = positional_encoding(dirs, self.dir_levels)
            if self.cat_origin:
                enc_d = jnp.concatenate([dirs, enc_d], axis=-1)
        if enc_x is None:
            enc_x = positional_encoding(pos, self.pos_levels)
            if self.cat_origin:
                enc_x = jnp.concatenate([pos, enc_x], axis=-1)
        enc_x = enc_x.astype(self.dtype)
        enc_d = enc_d.astype(self.dtype)

        h = MLP([self.hidden] * 4, dtype=self.dtype, name="block1")(enc_x)
        h = jnp.concatenate([enc_x, h], axis=-1)
        h = MLP([self.hidden, self.hidden, self.bottleneck], dtype=self.dtype,
                name="block2")(h)
        sigma = Dense(1, dtype=self.dtype, param_dtype=jnp.float32,
                      name="opacity_head")(h)[..., 0]
        b = Dense(self.bottleneck, dtype=self.dtype, param_dtype=jnp.float32,
                  name="bottle_neck")(h)
        rgb = MLP([128, 3], final_act="sigmoid", dtype=self.dtype, name="rgb_layer")(
            jnp.concatenate([b, enc_d], axis=-1)
        )
        return rgb.astype(jnp.float32), sigma.astype(jnp.float32)
