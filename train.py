#!/usr/bin/env python
"""Single-chip training entry (reference: /root/reference/train.py).

    python train.py --dataset_root ./data --dataset_name lego -s -w
    python train.py -r -e            # render-only on test poses
"""

from nerf_tpu.cli import Trainer, get_parser, render_only


def main():
    args = get_parser().parse_args()
    if args.do_render:
        render_only(args)
        return
    Trainer(args, mode="single").train()


if __name__ == "__main__":
    main()
