"""Periodic weighted parameter averaging across the 'replica' mesh axis.

Replaces the reference's hand-rolled per-parameter NCCL loops
(/root/reference/nerf/param_com.py:13-54 and model_average.py:230-260) with
pytree-level XLA collectives inside shard_map.  The reference's three live
strategies map to three collective schedules (numerically identical results,
different wire patterns — kept for parity and as ICI scheduling options):

  * 'all_reduce' — pre-scale by weight, psum over 'replica'
    (== model_average.py:248-251).
  * 'broadcast'  — all_gather the weighted params, reduce locally
    (== the reduce-to-root + broadcast pair, model_average.py:245-247).
  * 'p2p'        — ring of ppermute sends accumulating the weighted sum
    (== the explicit send/recv_avg exchange, model_average.py:237-244,
    without its hardcoded world-size-4 rank list).

The reference's 'delicate' strategy is an unimplemented stub upstream
(model_average.py:253-255) and is rejected here with a clear error.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

AVERAGE_STRATEGIES = ("all_reduce", "broadcast", "p2p")


def make_average_fn(mesh: Mesh, strategy: str = "all_reduce"):
    """Returns jitted fn: (params_stacked, weights (n_replica,)) -> averaged
    params_stacked (every replica ends up with the same weighted average).
    """
    if strategy not in AVERAGE_STRATEGIES:
        raise ValueError(
            f"unknown averaging strategy {strategy!r}; the reference's "
            f"'delicate' mode is an unimplemented stub upstream "
            f"(model_average.py:253-255). Choose from {AVERAGE_STRATEGIES}."
        )
    n_replica = mesh.shape["replica"]

    def per_replica(params_local, weights):
        p = jax.tree.map(lambda x: x[0], params_local)
        rep = jax.lax.axis_index("replica")
        w = weights[rep]

        if strategy == "all_reduce":
            avg = jax.tree.map(lambda x: jax.lax.psum(x * w, "replica"), p)
        elif strategy == "broadcast":
            avg = jax.tree.map(
                lambda x: jnp.sum(jax.lax.all_gather(x * w, "replica"), axis=0), p
            )
        else:  # p2p ring
            perm = [(i, (i + 1) % n_replica) for i in range(n_replica)]

            def ring(x):
                acc = x * w
                buf = acc
                for _ in range(n_replica - 1):
                    buf = jax.lax.ppermute(buf, "replica", perm)
                    acc = acc + buf
                return acc

            avg = jax.tree.map(ring, p)
        return jax.tree.map(lambda x: x[None], avg)

    sharded = jax.shard_map(
        per_replica,
        mesh=mesh,
        in_specs=(P("replica"), P()),
        out_specs=P("replica"),
        check_vma=False,
    )
    return jax.jit(sharded)
