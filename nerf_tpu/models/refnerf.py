"""Ref-NeRF model: spatial MLP + reflection-direction IDE directional MLP.

Capability parity (behavior, not code): /root/reference/nerf/ref_model.py:16-106
  - spatial MLP (4+4 layers, skip concat) -> heads {roughness, density},
    {normal, diffuse RGB, specular tint}, 128-d bottleneck
  - training-time Gaussian bottleneck noise (ref_model.py:84-85)
  - predicted normal normalized and negated (ref_model.py:87)
  - reflection direction + IDE with roughness as vMF kappa^-1 (ref_model.py:90-91)
  - n.v dot feature (ref_model.py:93)
  - directional MLP (4+4 layers, skip) -> specular RGB * sigmoid(tint)
  - optional sRGB output path (ref_model.py:100-105)
  - density returned UNactivated (density_act=identity, ref_model.py:26);
    the caller applies softplus(x + 0.5) (train.py:181)

The module is split into ``spatial`` / ``directional`` methods so the train
step can take d(density)/d(position) with one shared jax.vjp over the spatial
trunk (the reference re-walks the autograd graph instead,
ref_model.py:119-125).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from nerf_tpu.core.encoding import (
    ide_dim,
    integrated_dir_enc,
    linear_to_srgb,
    positional_encoding,
)
from nerf_tpu.models.mlp import MLP, Dense


class RefNeRF(nn.Module):
    pos_levels: int = 10
    ide_level: int = 4
    hidden: int = 256
    output_dim: int = 256
    bottleneck_dim: int = 128
    use_srgb: bool = False
    cat_origin: bool = True
    perturb_bottleneck: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.spa_block1 = MLP([self.hidden] * 4, dtype=self.dtype)
        self.spa_block2 = MLP(
            [self.hidden, self.hidden, self.hidden, self.output_dim], dtype=self.dtype
        )
        self.rho_tau_head = Dense(2, dtype=self.dtype, param_dtype=jnp.float32)
        self.norm_col_tint_head = Dense(9, dtype=self.dtype, param_dtype=jnp.float32)
        self.bottle_neck = Dense(self.bottleneck_dim, dtype=self.dtype,
                                 param_dtype=jnp.float32)
        self.dir_block1 = MLP([self.hidden] * 4, dtype=self.dtype)
        self.dir_block2 = MLP(
            [self.hidden, self.hidden, self.output_dim, self.output_dim],
            dtype=self.dtype,
        )
        self.spec_rgb_head = MLP([3], final_act="sigmoid", dtype=self.dtype)

    def spatial(self, pos: jnp.ndarray) -> dict:
        """Spatial trunk: pos (R, P, 3) -> per-sample field quantities.

        Returns dict with density (raw, fp32), normal (unit, negated),
        roughness (softplus(rho - 1)), diffuse (pre-activation), tint
        (pre-sigmoid), bottleneck (no noise applied here).
        """
        enc = positional_encoding(pos, self.pos_levels)
        if self.cat_origin:
            enc = jnp.concatenate([pos, enc], axis=-1)
        enc = enc.astype(self.dtype)
        h = self.spa_block1(enc)
        h = jnp.concatenate([enc, h], axis=-1)
        inter = self.spa_block2(h)

        rho_tau = self.rho_tau_head(inter)
        roughness = jax.nn.softplus(rho_tau[..., 0:1] - 1.0)
        density = rho_tau[..., 1].astype(jnp.float32)
        nct = self.norm_col_tint_head(inter)
        normal_raw, diffuse, tint = nct[..., 0:3], nct[..., 3:6], nct[..., 6:9]
        normal = -normal_raw / (jnp.linalg.norm(normal_raw, axis=-1, keepdims=True) + 1e-7)
        bottleneck = self.bottle_neck(inter)
        return {
            "density": density,
            "normal": normal.astype(jnp.float32),
            "roughness": roughness,
            "diffuse": diffuse,
            "tint": tint,
            "bottleneck": bottleneck,
        }

    def directional(self, spatial_out: dict, dirs: jnp.ndarray,
                    train: bool = False) -> jnp.ndarray:
        """Directional branch: spatial fields + view dirs -> final RGB (R, P, 3).

        ``dirs`` are the raw (unnormalized) ray directions — the reference
        feeds pts[..., 3:] straight in (ref_model.py:89-93).
        """
        normal = spatial_out["normal"].astype(self.dtype)
        b = spatial_out["bottleneck"]
        if train and self.perturb_bottleneck > 0:
            noise = self.perturb_bottleneck * jax.random.normal(
                self.make_rng("noise"), b.shape, dtype=self.dtype
            )
            b = b + noise
        dirs = dirs.astype(self.dtype)
        d_dot_n = jnp.sum(dirs * normal, axis=-1, keepdims=True)
        reflect = dirs - 2.0 * d_dot_n * normal
        wr_ide = integrated_dir_enc(reflect, spatial_out["roughness"], self.ide_level)
        nv_dot = d_dot_n  # n . d, matching ref_model.py:93

        x = jnp.concatenate([b, wr_ide, nv_dot], axis=-1)
        h = self.dir_block1(x)
        h = jnp.concatenate([x, h], axis=-1)
        h = self.dir_block2(h)
        specular = self.spec_rgb_head(h) * jax.nn.sigmoid(spatial_out["tint"])

        diffuse = spatial_out["diffuse"]
        if self.use_srgb:
            diffuse = jax.nn.sigmoid(diffuse - float(np.log(3.0)))
            rgb = linear_to_srgb(specular + diffuse)
        else:
            diffuse = jax.nn.sigmoid(diffuse)
            rgb = specular + diffuse
        return rgb.astype(jnp.float32)

    def __call__(self, pos: jnp.ndarray, dirs: jnp.ndarray, train: bool = False):
        """Full forward: (rgb (R,P,3), density raw (R,P), normal (R,P,3))."""
        spa = self.spatial(pos)
        rgb = self.directional(spa, dirs, train=train)
        return rgb, spa["density"], spa["normal"]

    def density_ide_dim(self) -> int:
        return ide_dim(self.ide_level)
