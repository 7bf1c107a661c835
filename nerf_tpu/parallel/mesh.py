"""Device mesh construction and multi-host initialization.

TPU-native replacement for the reference's NCCL/torch.distributed stack
(ddp_train.py:66-67, model_average.py:72-73, nerf/param_com.py): a 2-D
jax.sharding.Mesh with axes

  ('replica', 'data')

  * 'data'    — synchronous gradient data-parallelism (== the reference's
    DDP over ray batches); gradients are pmean'ed over this axis every step.
  * 'replica' — model-averaging groups (== the reference's federated
    model_average.py workers); parameters differ across this axis and are
    periodically weight-averaged.

The reference's hardcoded rendezvous env (MASTER_ADDR/PORT,
ddp_train.py:320-322) maps to jax.distributed.initialize for multi-host DCN;
within a host/pod slice, collectives compile onto ICI via XLA — there are no
hand-rolled per-parameter send/recv loops anywhere (param_com.py:13-54
becomes pytree-level collectives in model_average.py here).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_replica: int = 1,
              devices=None) -> Mesh:
    """Build a ('replica', 'data') mesh over the given (default: all) devices.

    Multi-process: jax.devices() enumerates GLOBAL devices ordered by process,
    so the row-major reshape keeps each process's devices contiguous along
    'data' — gradient pmeans ride the fastest links first.
    """
    devices = jax.devices() if devices is None else devices
    if n_data is None:
        if len(devices) % n_replica:
            raise ValueError(f"{len(devices)} devices not divisible by "
                             f"n_replica={n_replica}")
        n_data = len(devices) // n_replica
    n = n_replica * n_data
    grid = np.asarray(devices[:n]).reshape(n_replica, n_data)
    return Mesh(grid, ("replica", "data"))


def host_to_global(x, mesh: Mesh, spec: P = P()) -> jax.Array:
    """Stage a host value (identical on every process) as a global jax.Array.

    In a multi-controller program a jit over a global mesh rejects host-local
    inputs; make_array_from_callback builds the global array with each
    process supplying only its addressable shards.  The SPMD contract is the
    caller's: ``x`` must be the same value on all processes (true here — the
    dataset, the seeded shuffles, and the initial params all are).
    Single-process this is just a sharded device_put.
    """
    x = np.asarray(x)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def replicate_tree(tree, mesh: Mesh):
    """Reshard a (possibly replica-sharded) pytree to fully-replicated.

    One identity jit with replicated out_shardings: XLA inserts the
    all-gathers.  After this every process's local shard holds the full
    value, so np.asarray works on any process (used by eval renders and
    checkpoint saves, which the reference also runs per-rank,
    ddp_train.py:264-283).
    """
    fn = jax.jit(lambda t: t,
                 out_shardings=jax.tree.map(
                     lambda _: NamedSharding(mesh, P()), tree))
    return fn(tree)


def tree_to_host(tree, mesh: Optional[Mesh]):
    """np.asarray every leaf; gathers replica-sharded leaves first if a
    multi-process mesh is involved."""
    if mesh is not None:
        tree = replicate_tree(tree, mesh)
    return jax.tree.map(np.asarray, tree)


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host rendezvous (replaces init_process_group, ddp_train.py:67).

    On TPU pods all arguments are auto-detected from the environment; pass
    them explicitly only for exotic setups.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
