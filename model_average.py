#!/usr/bin/env python
"""Model-averaging (local-SGD / federated) training entry
(reference: /root/reference/model_average.py).

Each mesh replica trains on its own spatial division of the views (from
transforms_train_div.json written by tools/pose_division.py); every
--ma_epoch epochs the parameter pytrees are weight-averaged across the
'replica' axis with one of three collective schedules (--ma_method):
all_reduce (weighted psum), broadcast (all_gather + local reduce), or p2p
(ppermute ring) — the XLA equivalents of param_com.py:13-54. The reference's
'delicate' strategy is an unimplemented stub upstream and is rejected.
"""

from nerf_tpu.cli import Trainer, get_parser, render_only


def main():
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
    parser.add_argument("--coordinator", type=str, default=None,
                        help="multi-host coordinator address (host:port)")
    args = parser.parse_args()

    if args.coordinator is not None:
        from nerf_tpu.parallel import initialize_distributed

        initialize_distributed(args.coordinator)
    if args.do_render:
        render_only(args)
        return
    Trainer(args, mode="ma").train()


if __name__ == "__main__":
    main()
