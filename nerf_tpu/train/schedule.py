"""Learning-rate schedule: linear warmup + exponential decay + floor.

Behavior parity with DecayLrScheduler
(/root/reference/nerf/nerf_base.py:115-134), including the warmup ramp from
lr * min_ratio and the max(decay, min_ratio) floor.  Expressed as an optax
schedule callable instead of in-place optimizer mutation.

The reference also scales the base LR with the ray batch
(actual_lr = lr * rays / 512, train.py:56) — apply ``scaled_base_lr`` first.
"""

from __future__ import annotations

import jax.numpy as jnp


def scaled_base_lr(lr: float, sample_ray_num: int) -> float:
    return lr * sample_ray_num / 512.0


def decay_schedule(lr: float, min_ratio: float = 0.01, decay_rate: float = 0.1,
                   decay_step: int = 100000, warmup_step: int = 500):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup_step > 0:
            ratio = step / warmup_step
            warm = lr * (min_ratio * (1.0 - ratio) + ratio)
        else:
            warm = jnp.asarray(lr, jnp.float32)
        decay = lr * jnp.maximum(
            decay_rate ** ((step - warmup_step) / decay_step), min_ratio
        )
        return jnp.where(step < warmup_step, warm, decay)

    return schedule
