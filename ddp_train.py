#!/usr/bin/env python
"""Data-parallel training entry (reference: /root/reference/ddp_train.py).

TPU-native: instead of one OS process per GPU with NCCL rendezvous
(mp.spawn + hardcoded MASTER_ADDR, ddp_train.py:307-323), one process drives
all local devices through a jax.sharding.Mesh; gradients are pmean'ed over
the 'data' axis by XLA over ICI. For multi-host pods, pass --coordinator
(or nothing on Cloud TPU, where rendezvous is auto-detected).

The reference deliberately does not synchronize the proposal network's
gradients (TODO at ddp_train.py:4); reproduced with --no_sync_prop, fixed by
default. Implementation shared with the `nerf-tpu-ddp` console script
(nerf_tpu/cli/entry.py).
"""

from nerf_tpu.cli.entry import ddp_main as main

if __name__ == "__main__":
    main()
