"""Unified trainer loop: single-chip, mesh-DP ("ddp"), and model averaging.

Capability parity (behavior, not code) with the three reference entry loops:
  * train.py:27-270         -> mode="single"
  * ddp_train.py:33-304     -> mode="ddp"   (grad pmean over the 'data' axis)
  * model_average.py:35-305 -> mode="ma"    (periodic weighted param average
                                             over the 'replica' axis)

TPU-first redesign: where the reference runs one Python iteration per image
with per-step H2D copies and (for multi-device) one OS process per GPU, here
the whole dataset is staged to device HBM once and an entire epoch is ONE
compiled XLA program (lax.scan over the shuffled image order; for the
distributed modes a shard_map'ed scan over the ('replica','data') mesh).
The host loop only handles epoch orchestration: shuffling, logging,
eval renders, checkpoints.

The center-crop warmup (train.py:156: crop while train_cnt <
center_crop_iter) compiles as separate crop/no-crop epoch programs; the one
epoch containing the boundary runs per-step so the switch lands on the exact
iteration, as in the reference.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.cli.flags import config_from_args
from nerf_tpu.core.rays import crop_bounds
from nerf_tpu.data.blender import BlenderDataset
from nerf_tpu.data.sampler import LocalShuffleSampler, epoch_image_order
from nerf_tpu.train import schedule as schedule_lib
from nerf_tpu.train.pipeline import init_variables, make_models
from nerf_tpu.train.renderer import render_image
from nerf_tpu.train.step import (
    create_train_state, make_epoch_step, make_optimizer, make_train_step,
)
from nerf_tpu.utils import CheckpointManager, MetricsWriter, Timer, save_image_grid


class Trainer:
    """Owns models/state/data and runs the epoch loop for one process."""

    def __init__(self, args, mode: str = "single",
                 train_set: Optional[BlenderDataset] = None,
                 test_set: Optional[BlenderDataset] = None):
        if mode not in ("single", "ddp", "ma"):
            raise ValueError(f"unknown trainer mode {mode!r}")
        self.args = args
        self.mode = mode
        self.cfg = config_from_args(args)
        if args.debug:
            # Module-attributed NaN hooks on every flax submodule, entered
            # for the process lifetime like the reference's registered
            # forward hooks (train.py:86-89). Tracing of the epoch step
            # happens inside this context.  Two mechanisms (utils/debug.py):
            # callback mode (CPU/GPU/real-TPU hosts) prints in-step via host
            # callbacks + eager jax_debug_nans; flag mode (axon tunnel — no
            # host callbacks) compiles per-module finite checks into the
            # step, checked per epoch in _finish.  jax_debug_nans stays OFF
            # in flag mode: its NaN re-run would re-dispatch the whole epoch
            # op-by-op through the tunnel.
            from nerf_tpu.utils.debug import (
                host_callbacks_supported, nan_attribution,
            )

            if host_callbacks_supported():
                jax.config.update("jax_debug_nans", True)
            self._nan_hooks = nan_attribution()
            self._nan_hooks.__enter__()

        root = os.path.join(args.dataset_root, args.dataset_name)
        use_div = mode == "ma" and getattr(args, "div", False)
        if train_set is None:
            train_set = BlenderDataset.load(
                root, "train", img_scale=args.img_scale,
                scene_scale=args.scene_scale, white_bkg=args.white_bkg,
                use_div=use_div)
        if test_set is None:
            test_set = BlenderDataset.load(
                root, "test", img_scale=args.img_scale,
                scene_scale=args.scene_scale, white_bkg=args.white_bkg)
        self.train_set, self.test_set = train_set, test_set
        self.hw = train_set.image_hw
        self.focal = train_set.focal(
            legacy_square=getattr(args, "legacy_focal", False))
        from nerf_tpu.cli.flags import finalize_config

        self.cfg = finalize_config(self.cfg, self.focal)
        # the reference evaluates test views 1 and 4 only (train.py:135-137)
        n_test = len(test_set)
        self.test_view_ids = [i for i in (1, 4) if i < n_test] or [0]

        # --- models / optimizer / state -------------------------------------
        self.models = make_models(self.cfg)
        params = init_variables(self.cfg, jax.random.PRNGKey(args.seed))
        actual_lr = schedule_lib.scaled_base_lr(args.lr, args.sample_ray_num)
        self.schedule = schedule_lib.decay_schedule(
            actual_lr, min_ratio=args.min_ratio, decay_rate=args.decay_rate,
            decay_step=args.decay_step, warmup_step=args.warmup_step)
        self.tx = make_optimizer(self.cfg, self.schedule,
                                 grad_clip=args.grad_clip)

        self.base_key = jax.random.PRNGKey(args.seed)
        self.crop_window = crop_bounds(
            *self.hw, (args.center_crop_x, args.center_crop_y))

        # multi-process (multi-controller) runs: every process executes this
        # same program; only process 0 writes files/logs (rank-0 gating,
        # ddp_train.py:169,258 parity)
        self.is_main = jax.process_index() == 0
        if mode == "single":
            self.mesh = None
            self.n_replica, self.n_data = 1, 1
            self.state = create_train_state(params, self.tx)
        else:
            from nerf_tpu.parallel import make_mesh, stack_state

            n_dev = len(jax.devices())
            if mode == "ma":
                self.n_replica = int(getattr(args, "num_replicas", None)
                                     or n_dev)
                if self.n_replica > n_dev:
                    raise ValueError(
                        f"--num_replicas {self.n_replica} > {n_dev} devices")
                # hybrid replica x data: each averaging group data-parallels
                # over its share of the remaining chips — no idle hardware,
                # like the reference where every GPU is an averaging rank
                # (model_average.py:35-73). Capped by the smallest division:
                # every device needs one image per step.
                division = train_set.division
                if division is not None:
                    counts = np.bincount(np.asarray(division, np.int64))
                    min_div = int(counts[counts > 0].min())
                else:
                    min_div = max(1, len(train_set) // self.n_replica)
                self.n_data = max(1, min(n_dev // self.n_replica, min_div))
                if self.n_replica * self.n_data < n_dev and self.is_main:
                    print(f"warning: {n_dev} devices, using "
                          f"{self.n_replica}x{self.n_data} mesh "
                          f"({n_dev - self.n_replica * self.n_data} idle); "
                          f"pick --num_replicas dividing {n_dev} to use all")
            else:
                self.n_replica, self.n_data = 1, n_dev
            self.mesh = make_mesh(n_data=self.n_data, n_replica=self.n_replica)
            self.state = stack_state(params, self.tx, self.n_replica,
                                     mesh=self.mesh)

        if mode == "ma":
            division = train_set.division
            if division is not None:
                n_div = int(np.max(division)) + 1
                if n_div != self.n_replica:
                    raise ValueError(
                        f"dataset division has {n_div} groups but the mesh has "
                        f"{self.n_replica} replicas (devices); re-run "
                        f"tools/pose_division.py for {self.n_replica} groups "
                        f"or drop -div")
            self.samplers = [
                LocalShuffleSampler(
                    len(train_set),
                    division if division is not None else self.n_replica,
                    rank=r, seed=args.seed,
                    allow_imbalance=getattr(args, "allow_imbalanced", False))
                for r in range(self.n_replica)
            ]
            w = train_set.weights
            if w is not None and len(w) != self.n_replica:
                raise ValueError(
                    f"dataset has {len(w)} division weights for "
                    f"{self.n_replica} replicas")
            w = (np.asarray(w, np.float32) if w is not None
                 else np.full(self.n_replica, 1.0 / self.n_replica, np.float32))
            # global replicated array: the averaging jit runs over the full
            # mesh, which spans processes in multi-process runs
            from nerf_tpu.parallel import host_to_global

            self.ma_weights = host_to_global(w / w.sum(), self.mesh)
            from nerf_tpu.parallel import make_average_fn

            self.average_fn = make_average_fn(
                self.mesh, getattr(args, "ma_method", "all_reduce"))
            self.ma_epoch = int(getattr(args, "ma_epoch", 0) or 0)
        else:
            self.samplers, self.ma_epoch = None, 0

        # --- compiled step/epoch programs ------------------------------------
        self._fns = {}
        self.epoch_start = 0
        # host mirror of state.step: scalar device reads through the axon
        # tunnel cost ~0.4 s EACH (round-3 cProfile of the epoch loop), so
        # the loop must never ask the device what step it is on
        self._host_step = 0
        # ops shell
        self.ckpt = CheckpointManager(
            os.path.join(args.ckpt_dir, args.dataset_name),
            max_save=args.max_save, prefix=f"{args.name}_chkpt")
        if args.load:
            restored = self.ckpt.restore(target=self.state)
            if restored is not None:
                self.state, step, self.epoch_start = restored
                self._host_step = int(step)
                if self.mesh is not None:
                    # restored leaves are host numpy; multi-process jit over a
                    # global mesh rejects them — re-stage as global arrays
                    from nerf_tpu.parallel import restage_state

                    self.state = restage_state(self.state, self.mesh)
                if self.is_main:
                    print(f"Resumed from step {step}, epoch {self.epoch_start}.")
            elif self.is_main:
                print(f"Not loading: no checkpoint under {self.ckpt.directory}")
        self.writer = MetricsWriter(
            base_dir=args.log_dir, epochs=args.epochs, del_dir=args.del_dir,
            use_tensorboard=not args.no_tensorboard, enabled=self.is_main)
        self.train_timer, self.eval_timer = Timer(5), Timer(5)

    # --- program cache -------------------------------------------------------
    def _epoch_fn(self, cropped: bool):
        key = ("epoch", cropped)
        if key not in self._fns:
            crop = self.crop_window if cropped else None
            # donate=False: the live state must stay valid so the signal
            # handler can checkpoint it immediately, mid-epoch included
            if self.mode == "single":
                self._fns[key] = make_epoch_step(
                    self.models, self.tx, self.cfg, self.hw, self.focal,
                    crop_window=crop, base_key=self.base_key, donate=False)
            else:
                from nerf_tpu.parallel import make_parallel_epoch_step

                self._fns[key] = make_parallel_epoch_step(
                    self.models, self.tx, self.cfg, self.hw, self.focal,
                    self.mesh, crop_window=crop, base_key=self.base_key,
                    sync_prop=not getattr(self.args, "no_sync_prop", False),
                    donate=False)
        return self._fns[key]

    def _step_fn(self, cropped: bool):
        key = ("step", cropped)
        if key not in self._fns:
            crop = self.crop_window if cropped else None
            if self.mode == "single":
                self._fns[key] = make_train_step(
                    self.models, self.tx, self.cfg, self.hw, self.focal,
                    crop_window=crop, base_key=self.base_key, donate=False)
            else:
                from nerf_tpu.parallel import make_parallel_train_step

                self._fns[key] = make_parallel_train_step(
                    self.models, self.tx, self.cfg, self.hw, self.focal,
                    self.mesh, crop_window=crop, base_key=self.base_key,
                    sync_prop=not getattr(self.args, "no_sync_prop", False),
                    donate=False)
        return self._fns[key]

    # --- data orchestration ----------------------------------------------------
    def _epoch_indices(self, ep: int) -> np.ndarray:
        """Image visit order for epoch ``ep``.

        single: (steps,) int32;  ddp/ma: (steps, n_replica, n_data) int32.
        """
        if self.mode == "single":
            return epoch_image_order(len(self.train_set), ep, self.args.seed)
        if self.mode == "ddp":
            order = epoch_image_order(len(self.train_set), ep, self.args.seed)
            steps = len(order) // self.n_data
            if steps == 0:
                raise ValueError(
                    f"{len(order)} train images < {self.n_data} devices")
            # leftover images (order[steps*n_data:]) are DROPPED this epoch —
            # a per-epoch reshuffle means every image still trains in
            # expectation (the reference's DistributedSampler pads with
            # duplicates instead; we prefer no duplicate gradients).
            # Pinned by test_cli.py::test_ddp_epoch_indices_drop_documented.
            return order[: steps * self.n_data].reshape(steps, 1, self.n_data)
        rows = LocalShuffleSampler.stacked_epoch_indices(self.samplers, ep)
        if self.n_data == 1:
            return rows.T[:, :, None]  # (steps, n_replica, 1)
        # hybrid MA: each replica's division feeds n_data devices per step
        steps = rows.shape[1] // self.n_data
        if steps == 0:
            raise ValueError(
                f"division of {rows.shape[1]} images < n_data={self.n_data} "
                f"devices per replica")
        rows = rows[:, : steps * self.n_data]
        return rows.reshape(self.n_replica, steps, self.n_data).transpose(1, 0, 2)

    def _mfu(self, rays_per_sec_per_chip: float) -> float:
        """Model-FLOPs utilization per chip (nerf_tpu/utils/flops.py; peak
        assumes v5e bf16 — a relative health meter, not an absolute claim on
        other chips)."""
        if not hasattr(self, "_flops_per_step"):
            from nerf_tpu.utils.flops import train_step_flops

            # shapes only (no device reads — multi-process-safe); distributed
            # modes drop the leading replica axis
            strip = 0 if self.mode == "single" else 1
            shapes = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape[strip:], x.dtype),
                self.state.params)
            try:
                self._flops_per_step = train_step_flops(self.cfg, shapes)
            except (KeyError, TypeError) as e:
                # a params-tree/key mismatch means the FLOPs model is broken;
                # say so once instead of silently reporting MFU 0.0%
                print(f"warning: FLOPs model failed ({type(e).__name__}: {e});"
                      f" MFU will report 0.0%")
                self._flops_per_step = 0.0
        from nerf_tpu.utils.flops import V5E_BF16_PEAK

        steps_s = rays_per_sec_per_chip / self.cfg.ray_batch
        return steps_s * self._flops_per_step / V5E_BF16_PEAK

    def _sync_stop(self) -> bool:
        """Any-process stop decision for the epoch loop.

        A SIGTERM delivered to only ONE rank must stop ALL ranks on the same
        epoch: otherwise the signaled rank enters the collective checkpoint
        gather (_saveable_state) while its peers proceed into the next
        epoch's train-step collectives — mismatched collectives deadlock the
        job.  One tiny host allgather per epoch buys the guarantee.
        """
        local = self._stop_signal is not None
        if jax.process_count() == 1:
            return local
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(np.int32(local))
        if int(flags.max()) and self._stop_signal is None:
            import signal

            self._stop_signal = signal.SIGTERM  # a peer was signaled
        return bool(flags.max())

    def eval_params(self):
        if self.mode == "single":
            return self.state.params
        from nerf_tpu.parallel import unstack_params

        return unstack_params(self.state.params, mesh=self.mesh)

    def _saveable_state(self):
        """State with every leaf readable on this process (multi-process:
        replica-sharded leaves are all-gathered first)."""
        if self.mesh is None or jax.process_count() == 1:
            return self.state
        from nerf_tpu.parallel.mesh import replicate_tree

        return replicate_tree(self.state, self.mesh)

    def _lr_at(self, step: int) -> float:
        """Learning rate at ``step``, from a host-resident table.

        Evaluating ``self.schedule`` eagerly dispatches a device program —
        ~0.4 s through the axon tunnel, and _log_epoch_metrics needs it
        steps/eval_time times per epoch (round-3 cProfile: these dispatches
        were ~1.7 s/epoch of the CLI's wall clock, a 2.4x end-to-end slowdown
        at the full reference budget).  One vmap'd evaluation materializes
        the whole run's schedule up front (~1 MB at 240k steps)."""
        tbl = getattr(self, "_lr_tbl", None)
        if tbl is None or step >= tbl.shape[0]:
            n = max(step + 1,
                    self.args.epochs * max(1, len(self.train_set)) + 1)
            tbl = np.asarray(jax.jit(jax.vmap(self.schedule))(
                jnp.arange(n, dtype=jnp.int32)))
            self._lr_tbl = tbl
        return float(tbl[step])

    # --- logging --------------------------------------------------------------
    def _log_epoch_metrics(self, metrics_np, steps: int, step_base: int):
        """``metrics_np`` must already be host arrays (one device_get per
        epoch in the train loop — per-scalar fetches are ~0.4 s each on the
        axon tunnel)."""
        loss = metrics_np["loss"]
        psnr = metrics_np["psnr"]
        for i in range(0, steps, max(1, self.args.eval_time)):
            step = step_base + i
            self.writer.add_scalar("Train Loss", loss[i], step)
            self.writer.add_scalar("PSNR", psnr[i], step)
            self.writer.add_scalar("Learning Rate", self._lr_at(step), step)

    def _eval_and_checkpoint(self, ep: int):
        self.eval_timer.tic()
        params = self.eval_params()
        panels, test_loss = [], 0.0
        for vid in self.test_view_ids:
            out = render_image(
                params, self.test_set.poses[vid], self.hw, self.focal,
                self.cfg, sample_num=self.cfg.n_fine,
                render_depth=self.args.render_depth,
                render_normal=self.args.render_normal,
                key=jax.random.fold_in(self.base_key, 10_000 + vid),
                chunk=self.args.eval_chunk,
                # distributed modes shard eval ray chunks over the whole
                # mesh (the reference renders redundantly per rank,
                # ddp_train.py:264-283)
                mesh=self.mesh)
            gt = self.test_set.images[vid]
            test_loss += float(np.mean((out["rgb"] - gt) ** 2))
            panels.append(out["rgb"])
            if "normal" in out:
                panels.append(out["normal"])
            if "depth" in out:
                d = out["depth"]
                panels.append(d / max(float(d.max()), 1e-8))
        self.eval_timer.toc()
        test_loss /= len(self.test_view_ids)
        step = self._host_step
        # every process renders (cheap, matches ddp_train.py:264-283); the
        # collective state gather below needs all processes too — only the
        # file writes are rank-0-gated
        state_s = self._saveable_state()
        if not self.is_main:
            return
        # log at the global step and name images by epoch (the reference's
        # run-local test_cnt restarts at 0 on resume, clobbering grids and
        # interleaving the Test Loss series)
        self.writer.add_scalar("Test Loss", test_loss, step)
        nrow = 1 + int(self.args.render_normal) + int(self.args.render_depth)
        img_path = os.path.join(self.args.output_dir,
                                f"result_ep{ep:04d}.png")
        save_image_grid(img_path, panels, nrow=nrow)
        self.ckpt.save(state_s, step=step, epoch=ep)
        print(f"Evaluation in epoch: {ep:4d} / {self.args.epochs:4d}\t"
              f"test loss: {test_loss:.4f}\t"
              f"avg eval time: {self.eval_timer.get_mean_time():.4f}s -> {img_path}")

    # --- main loop --------------------------------------------------------------
    def run_epoch(self, ep: int):
        """One epoch; returns (steps_run, stacked metrics)."""
        idx = self._epoch_indices(ep)
        steps = idx.shape[0]
        step0 = self._host_step
        cci = self.args.center_crop_iter
        if self.mesh is None:
            idx_dev = jnp.asarray(idx)
        else:
            from nerf_tpu.parallel import host_to_global

            idx_dev = host_to_global(idx, self.mesh)

        if cci <= step0 or cci >= step0 + steps:
            # the whole epoch is on one side of the crop boundary
            epoch_fn = self._epoch_fn(cropped=step0 < cci)
            self.state, metrics = epoch_fn(
                self.state, self.pool, self.poses, idx_dev)
        else:
            # boundary epoch: per-step so the switch is exact (train.py:156)
            collected = []
            state = self.state
            for i in range(steps):
                fn = self._step_fn(cropped=step0 + i < cci)
                state, m = fn(state, self.pool, self.poses, idx_dev[i])
                collected.append(m)
            self.state = state
            metrics = jax.tree.map(lambda *xs: jnp.stack(xs), *collected)
        self._host_step = step0 + steps
        return steps, metrics

    def train(self):
        args = self.args
        os.makedirs(args.output_dir, exist_ok=True)
        # preemption safety: SIGTERM/SIGINT checkpoint self.state IMMEDIATELY
        # (it always points at live buffers: the trainer's epoch programs run
        # with donate=False), then exit at the next safe bytecode boundary.
        # self.state holds the last completed epoch's result, so a signal
        # landing mid-epoch loses at most the in-flight epoch. A second
        # signal falls through to Python's default handling (hard abort).
        import signal

        self._stop_signal = None
        # must exist before the handlers are live: a signal during the
        # device_put staging below would otherwise hit an AttributeError
        self._ep = self.epoch_start

        def _save_and_flag(signum, frame):
            if self._stop_signal is not None:
                for s, h in old_handlers.items():
                    signal.signal(s, h)
                raise KeyboardInterrupt
            self._stop_signal = signum
            if jax.process_count() > 1 and self.n_replica > 1:
                # replica-sharded state needs a collective gather to save —
                # unsafe from a signal handler (peers may not be in it);
                # the epoch loop saves cooperatively before exiting
                print(f"\nsignal {signum}: stopping after this epoch "
                      f"(cooperative multi-process checkpoint)")
                return
            step = int(self.state.step)
            if self.is_main:
                path = self.ckpt.save(self.state, step=step, epoch=self._ep)
                print(f"\nsignal {signum}: checkpointed step {step} -> {path}")

        old_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                old_handlers[sig] = signal.signal(sig, _save_and_flag)
            except ValueError:
                pass  # non-main thread (tests)
        if self.mesh is None:
            self.pool = jax.device_put(jnp.asarray(self.train_set.pixel_pool()))
            self.poses = jax.device_put(jnp.asarray(self.train_set.poses))
        else:
            # global replicated arrays: required for multi-process jit, and
            # single-process it skips the per-dispatch resharding copy
            from nerf_tpu.parallel import host_to_global

            self.pool = host_to_global(self.train_set.pixel_pool(), self.mesh)
            self.poses = host_to_global(self.train_set.poses, self.mesh)
        if self.is_main:
            print(f"Training: mode={self.mode} devices={len(jax.devices())} "
                  f"processes={jax.process_count()} "
                  f"mesh=({self.n_replica}x{self.n_data}) images={len(self.train_set)} "
                  f"hw={self.hw} focal=({self.focal[0]:.2f},{self.focal[1]:.2f}) "
                  f"model={self.cfg.model} bf16={self.cfg.use_bf16}")

        trace_dir = getattr(args, "trace", None)

        # ONE-EPOCH-DEEP PIPELINE.  Dispatch is async; the fetch+log+print
        # for epoch N happens AFTER epoch N+1 is dispatched, so the host's
        # metrics round trip (a device_get is ~0.1-0.4 s through the axon
        # tunnel) overlaps device compute instead of idling the chip between
        # epochs.  The 240k-step full-budget run measured ~0.29 s/epoch of
        # serialized host overhead (~30% of wall clock) before this.
        # Requires donate=False epoch programs (they are — the signal
        # handler depends on it too) so the in-flight epoch and the pending
        # one can coexist.  Epochs that need the finished state on the host
        # (trace, eval/checkpoint, MA averaging, stop) flush and run
        # synchronously.
        pending = None  # (ep, steps, step_base, metrics) not yet fetched

        def _finish(ep_f, steps_f, base_f, metrics_f):
            # ONE host<->device round trip for the epoch's metrics (the
            # per-scalar alternative costs ~0.4 s per fetch on this tunnel);
            # blocks until that epoch's device work is complete
            metrics_np = jax.device_get(metrics_f)
            if self.args.debug:
                # -b flag-mode attribution: compiled-in per-module finite
                # flags ride the metrics; raise naming the module on the
                # first bad epoch (no-op in callback mode / healthy runs)
                from nerf_tpu.utils.debug import (
                    raise_on_nan_flags, split_nan_flags,
                )

                metrics_np, nan_flags = split_nan_flags(metrics_np)
                raise_on_nan_flags(nan_flags)
            now = time.perf_counter()
            # completion-to-completion interval == true wall time this epoch
            # occupied, including any host overhead it failed to hide
            dt = now - self._epoch_mark
            self._epoch_mark = now
            self.train_timer.record(dt)
            self._log_epoch_metrics(metrics_np, steps_f, base_f)
            loss = float(metrics_np["loss"][-1])
            psnr = float(metrics_np["psnr"][-1])
            lr_now = self._lr_at(base_f + steps_f)
            # every device (data AND replica axes) trains ray_batch rays/step
            n_dev = self.n_data * self.n_replica
            rays_s = steps_f * n_dev * self.cfg.ray_batch / max(dt, 1e-9)
            if self.is_main:
                print(f"Epoch {ep_f:4d} / {args.epochs:4d}\tloss: {loss:.4f}\t"
                      f"PSNR: {psnr:.3f}\tlr: {lr_now:.7f}\t"
                      f"{rays_s:,.0f} rays/s\t"
                      f"MFU: {self._mfu(rays_s / n_dev) * 100:.1f}%\t"
                      f"ETA: {self.train_timer.eta_str(args.epochs - ep_f - 1)}")
            self.writer.add_scalar("Time/epoch", dt, ep_f)
            self.writer.add_scalar("MFU", self._mfu(rays_s / n_dev), ep_f)

        self._epoch_mark = time.perf_counter()
        for ep in range(self.epoch_start, args.epochs):
            self._ep = ep
            step_base = self._host_step
            traced = trace_dir is not None and ep == self.epoch_start + 1
            if traced:
                if pending is not None:
                    _finish(*pending)
                    pending = None
                # trace the second epoch: past compilation, steady state
                with jax.profiler.trace(trace_dir):
                    steps, metrics = self.run_epoch(ep)
                    jax.block_until_ready(self.state.params)
                print(f"profiler trace written to {trace_dir}")
            else:
                steps, metrics = self.run_epoch(ep)  # async dispatch
            if pending is not None:
                _finish(*pending)
                pending = None

            if self._sync_stop():
                # the in-flight epoch still completes (its state is what the
                # signal handler checkpointed / the cooperative save gathers)
                if jax.process_count() > 1 and self.n_replica > 1:
                    # the cooperative checkpoint the signal handler deferred:
                    # _sync_stop just guaranteed every process reaches this
                    # point on the same epoch, so the replica gather below is
                    # a matched collective even if only one rank was signaled
                    state_s = self._saveable_state()
                    if self.is_main:
                        step = int(self.state.step)
                        path = self.ckpt.save(state_s, step=step, epoch=ep)
                        print(f"cooperative checkpoint at step {step} -> {path}")
                raise SystemExit(128 + self._stop_signal)

            is_ma = self.mode == "ma" and self.ma_epoch and \
                (ep + 1) % self.ma_epoch == 0
            is_eval = ((ep % args.output_time == 0) or ep == args.epochs - 1) \
                and ep > self.epoch_start
            if is_ma or is_eval or traced:
                _finish(ep, steps, step_base, metrics)
                if is_ma:
                    t0 = time.perf_counter()
                    self.state = self.state._replace(
                        params=self.average_fn(self.state.params,
                                               self.ma_weights))
                    jax.block_until_ready(self.state.params)
                    self.writer.add_scalar("Time/communication",
                                           time.perf_counter() - t0, ep)
                if is_eval:
                    self._eval_and_checkpoint(ep)
                # eval/averaging time is not train time: re-mark so the next
                # epoch's interval covers only itself (matches the old
                # tic-after-eval behavior)
                self._epoch_mark = time.perf_counter()
            else:
                pending = (ep, steps, step_base, metrics)

        if pending is not None:
            _finish(*pending)

        for sig, handler in old_handlers.items():
            signal.signal(sig, handler)

        # final save under ./model/<name>.ckpt (train.py:261-268 parity);
        # the gather is collective (all processes), the write rank-0-only
        from nerf_tpu.utils import save_checkpoint

        state_s = self._saveable_state()
        final = os.path.join("model", f"{args.name}.ckpt")
        if self.is_main:
            save_checkpoint(final, state_s, step=int(self.state.step),
                            epoch=args.epochs)
            print(f"Training completed. Final model -> {final}")
        self.writer.close()
        return self.state
