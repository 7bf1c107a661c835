"""CLI main() implementations, shared by the repo-root scripts
(train.py / ddp_train.py / model_average.py) and the pip console scripts
(pyproject [project.scripts]) — one flag surface, no drift.
"""

from __future__ import annotations


def train_main():
    """Single-chip training / render-only (reference: train.py)."""
    from nerf_tpu.cli import Trainer, get_parser, render_only

    args = get_parser().parse_args()
    if args.do_render:
        render_only(args)
        return
    Trainer(args, mode="single").train()


def ddp_main():
    """Data-parallel training over the device mesh (reference: ddp_train.py)."""
    from nerf_tpu.cli import Trainer, get_parser, render_only

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


def ma_main():
    """Model-averaging training (reference: model_average.py)."""
    from nerf_tpu.cli import Trainer, get_parser, render_only

    parser = get_parser()
    parser.add_argument("--ma_epoch", required=True, type=int,
                        help="Model average will be used each <ma_epoch> epoch")
    parser.add_argument("--ma_method", type=str, default="all_reduce",
                        choices=["p2p", "broadcast", "all_reduce"],
                        help="Model average strategies")
    parser.add_argument("-div", "--div", default=False, action="store_true",
                        help="Whether to use divided dataset (_div.json)")
    parser.add_argument("--allow_imbalanced", default=False,
                        action="store_true",
                        help="Whether to allow imbalanced dataset")
    parser.add_argument("--num_replicas", type=int, default=None,
                        help="model-averaging replicas (default: all local "
                             "devices; must match the dataset division count "
                             "under -div)")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="multi-host coordinator address (host:port)")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    args = parser.parse_args()

    if args.coordinator is not None:
        from nerf_tpu.parallel import initialize_distributed

        initialize_distributed(args.coordinator, args.num_processes,
                               args.process_id)
    if args.do_render:
        render_only(args)
        return
    Trainer(args, mode="ma").train()
