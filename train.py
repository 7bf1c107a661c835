#!/usr/bin/env python
"""Single-chip training entry (reference: /root/reference/train.py).

    python train.py --dataset_root ./data --dataset_name lego -s -w
    python train.py -r -e            # render-only on test poses

Implementation shared with the `nerf-tpu-train` console script
(nerf_tpu/cli/entry.py).
"""

from nerf_tpu.cli.entry import train_main as main

if __name__ == "__main__":
    main()
