"""Console-script entry points (pyproject [project.scripts]).

Thin wrappers so `pip install .` exposes the same three trainers as the
repo-root scripts train.py / ddp_train.py / model_average.py.
"""

from __future__ import annotations


def train_main():
    from nerf_tpu.cli import Trainer, get_parser, render_only

    args = get_parser().parse_args()
    if args.do_render:
        render_only(args)
        return
    Trainer(args, mode="single").train()


def ddp_main():
    from nerf_tpu.cli import Trainer, get_parser, render_only

    parser = get_parser()
    parser.add_argument("--coordinator", type=str, default=None)
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("--no_sync_prop", default=False, action="store_true")
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
    from nerf_tpu.cli import Trainer, get_parser, render_only

    parser = get_parser()
    parser.add_argument("--ma_epoch", required=True, type=int)
    parser.add_argument("--ma_method", type=str, default="all_reduce",
                        choices=["p2p", "broadcast", "all_reduce"])
    parser.add_argument("-div", "--div", default=False, action="store_true")
    parser.add_argument("--allow_imbalanced", default=False,
                        action="store_true")
    parser.add_argument("--coordinator", type=str, default=None)
    args = parser.parse_args()
    if args.coordinator is not None:
        from nerf_tpu.parallel import initialize_distributed

        initialize_distributed(args.coordinator)
    if args.do_render:
        render_only(args)
        return
    Trainer(args, mode="ma").train()
