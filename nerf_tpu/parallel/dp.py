"""Sharded training step: data parallelism + replica groups via shard_map.

Replaces the reference's DistributedDataParallel wrap (ddp_train.py:95-99)
and the per-process model_average training loop (model_average.py:35-229)
with one SPMD program over the ('replica', 'data') mesh:

  * parameters carry a leading replica axis, sharded over 'replica'
    (replica count 1 == plain DDP; data count 1 == pure model averaging);
  * each device samples rays from its own assigned image (the reference's
    DistributedSampler, ddp_train.py:129) and computes local gradients;
  * gradients are pmean'ed over 'data' — the compiled-by-XLA equivalent of
    DDP's bucketed NCCL allreduce;
  * the reference deliberately does NOT sync the proposal net's gradients
    (TODO at ddp_train.py:4, wrap at :98 covers mip_net only) — reproduced
    behind ``sync_prop=False``, fixed by default.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from nerf_tpu.train.config import PipelineConfig
from nerf_tpu.train.step import TrainState, compute_loss, sample_train_rays


def stack_state(params, tx, n_replica: int, mesh: Mesh = None) -> TrainState:
    """Replicate params into a leading (n_replica, ...) axis and init the
    optimizer per replica.

    With ``mesh`` given, every leaf is built as a GLOBAL jax.Array sharded
    P('replica') over the mesh — required for multi-process execution, where
    a jit over a global mesh rejects host-local inputs (each process's
    initial params are identical, so each can supply its shards locally).
    """
    if mesh is None:
        stacked = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (n_replica, *x.shape)), params
        )
        opt_state = jax.vmap(tx.init)(stacked)
        return TrainState(params=stacked, opt_state=opt_state,
                          step=jnp.zeros((), jnp.int32))

    import numpy as np
    from jax.sharding import NamedSharding

    from nerf_tpu.parallel.mesh import host_to_global

    stacked = jax.tree.map(
        lambda x: host_to_global(
            np.broadcast_to(np.asarray(x)[None], (n_replica, *x.shape)),
            mesh, P("replica")),
        params,
    )
    # vmap(tx.init) under jit so the opt state comes out with propagated
    # (replica-sharded) shardings instead of host-local buffers
    opt_state = jax.jit(jax.vmap(tx.init))(stacked)
    return TrainState(params=stacked, opt_state=opt_state,
                      step=host_to_global(np.zeros((), np.int32), mesh, P()))


def restage_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Re-stage a host-side (e.g. checkpoint-restored) stacked TrainState as
    global arrays on the mesh — required before feeding a multi-process jit."""
    import numpy as np

    from nerf_tpu.parallel.mesh import host_to_global

    def stage(spec):
        return lambda x: host_to_global(np.asarray(x), mesh, spec)

    return TrainState(
        params=jax.tree.map(stage(P("replica")), state.params),
        opt_state=jax.tree.map(stage(P("replica")), state.opt_state),
        step=host_to_global(np.asarray(state.step), mesh, P()),
    )


def unstack_params(stacked, replica: int = 0, mesh: Mesh = None):
    """Pull one replica's params out of the stacked pytree.

    Multi-process: the requested replica may live on another process's
    devices, so gather to fully-replicated first (pass ``mesh``)."""
    if mesh is not None and jax.process_count() > 1:
        from nerf_tpu.parallel.mesh import replicate_tree

        stacked = replicate_tree(stacked, mesh)
    return jax.tree.map(lambda x: x[replica], stacked)


def make_parallel_train_step(models, tx, cfg: PipelineConfig, hw, focal,
                             mesh: Mesh, crop_window=None, base_key=None,
                             sync_prop: bool = True, donate: bool = True):
    """Returns jitted fn: (state, pixel_pool, poses, img_idx) -> (state, metrics).

    state.params/opt_state carry a leading replica axis (see stack_state);
    img_idx is (n_replica, n_data) int32 — one image per device per step
    (LocalShuffleSampler.stacked_epoch_indices produces the replica rows).
    metrics are pmean'ed over the whole mesh.
    """
    base_key = jax.random.PRNGKey(0) if base_key is None else base_key
    n_data = mesh.shape["data"]

    def per_device(state: TrainState, pixel_pool, poses, img_idx):
        # local shapes: params (1, ...), img_idx (1, 1)
        params = jax.tree.map(lambda x: x[0], state.params)
        opt_state = jax.tree.map(lambda x: x[0], state.opt_state)
        rep = jax.lax.axis_index("replica")
        dat = jax.lax.axis_index("data")
        # two-level fold: a single arithmetic fold (step * K + device) wraps
        # int32 and repeats key streams with period K steps on long runs
        key = jax.random.fold_in(
            jax.random.fold_in(base_key, state.step), rep * n_data + dat
        )
        k_pix, k_render = jax.random.split(key)

        rays, rgb_gt = sample_train_rays(
            k_pix, pixel_pool, poses, img_idx[0, 0], hw, focal,
            cfg.ray_batch, crop_window,
        )
        (_, metrics), grads = jax.value_and_grad(
            lambda p: compute_loss(models, p, rays, rgb_gt, k_render, cfg),
            has_aux=True,
        )(params)

        if sync_prop or "prop" not in grads:
            grads = jax.lax.pmean(grads, "data")
        else:
            # reference parity: only the fine net's gradients are synchronized
            grads = {
                "nerf": jax.lax.pmean(grads["nerf"], "data"),
                "prop": grads["prop"],
            }
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = jax.lax.pmean(jax.lax.pmean(metrics, "data"), "replica")
        new_state = TrainState(
            params=jax.tree.map(lambda x: x[None], params),
            opt_state=jax.tree.map(lambda x: x[None], opt_state),
            step=state.step + 1,
        )
        return new_state, metrics

    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(
            TrainState(params=P("replica"), opt_state=P("replica"), step=P()),
            P(),  # pixel_pool replicated
            P(),  # poses replicated
            P("replica", "data"),
        ),
        out_specs=(
            TrainState(params=P("replica"), opt_state=P("replica"), step=P()),
            P(),
        ),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def make_parallel_epoch_step(models, tx, cfg: PipelineConfig, hw, focal,
                             mesh: Mesh, crop_window=None, base_key=None,
                             sync_prop: bool = True, donate: bool = True):
    """Whole-epoch lax.scan of the sharded step (epoch analogue of
    make_parallel_train_step).

    Returned fn: (state, pixel_pool, poses, img_idx) -> (state, metrics) where
    img_idx is (steps, n_replica, n_data) int32 — per step, one image per
    device — and metrics are (steps,)-stacked mesh-means. One compiled SPMD
    program per epoch: the XLA equivalent of the reference's per-iteration
    DDP loop (ddp_train.py:180-246) without any per-step dispatch.
    """
    step = make_parallel_train_step(
        models, tx, cfg, hw, focal, mesh,
        crop_window=crop_window, base_key=base_key, sync_prop=sync_prop,
        donate=False,
    )

    def epoch_fn(state: TrainState, pixel_pool, poses, img_idx):
        return jax.lax.scan(
            lambda c, idx: step(c, pixel_pool, poses, idx), state, img_idx
        )

    return jax.jit(epoch_fn, donate_argnums=(0,) if donate else ())
