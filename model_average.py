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
Implementation shared with the `nerf-tpu-ma` console script
(nerf_tpu/cli/entry.py).
"""

from nerf_tpu.cli.entry import ma_main as main

if __name__ == "__main__":
    main()
