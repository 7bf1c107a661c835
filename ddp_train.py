#!/usr/bin/env python
"""Data-parallel training entry (reference: /root/reference/ddp_train.py).

TPU-native: instead of one OS process per GPU with NCCL rendezvous
(mp.spawn + hardcoded MASTER_ADDR, ddp_train.py:307-323), one process drives
all local devices through a jax.sharding.Mesh; gradients are pmean'ed over
the 'data' axis by XLA over ICI. For multi-host pods, pass --coordinator
(or nothing on Cloud TPU, where rendezvous is auto-detected) — this replaces
the reference's -n/-g/-nr world arithmetic.

The reference deliberately does not synchronize the proposal network's
gradients (TODO at ddp_train.py:4); that quirk is reproduced with
--no_sync_prop, and fixed by default.
"""

from nerf_tpu.cli import Trainer, get_parser, render_only


def main():
    parser = get_parser()
    parser.add_argument("--coordinator", type=str, default=None,
                        help="multi-host coordinator address (host:port)")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("--no_sync_prop", default=False, action="store_true",
                        help="reference parity: don't sync proposal-net grads "
                             "(ddp_train.py:4,98)")
    args = parser.parse_args()

    if args.coordinator is not None:
        from nerf_tpu.parallel import initialize_distributed

        initialize_distributed(args.coordinator, args.num_processes,
                               args.process_id)
    if args.do_render:
        render_only(args)
        return
    Trainer(args, mode="ddp").train()


if __name__ == "__main__":
    main()
