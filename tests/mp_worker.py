"""Worker for the 2-process distributed test (tests/test_multiprocess.py).

Run as: python tests/mp_worker.py <port> <process_id>
Joins a 2-process jax.distributed job (4 virtual CPU devices per process,
8 global), then runs the SAME sharded program as the single-process oracle:
one DP+MA train step over a ('replica', 'data') = (2, 4) global mesh,
followed by a weighted parameter average over 'replica'.  Prints one
RESULT json line with the loss and per-replica parameter checksums.

This is the capability the reference gets from mp.spawn + NCCL env
rendezvous (/root/reference/ddp_train.py:66-67,320-323,
model_average.py:72-73): multiple OS processes cooperating in one training
step. Here each process holds a subset of the global devices and all
collectives are compiled by XLA (Gloo transport on CPU).
"""

import json
import os
import sys

PORT, PID = sys.argv[1], int(sys.argv[2])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.distributed.initialize(f"localhost:{PORT}", num_processes=2,
                           process_id=PID)
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from tests.mp_program import (  # noqa: E402
    run_ddp_trainer, run_ma_trainer, run_program,
)


def main():
    assert len(jax.devices()) == 8, "expected 8 global devices"
    assert len(jax.local_devices()) == 4, "expected 4 local devices"
    if len(sys.argv) > 3 and sys.argv[3] == "trainer":
        result = run_ma_trainer(sys.argv[4], sys.argv[5])
    elif len(sys.argv) > 3 and sys.argv[3] == "trainer_ddp":
        result = run_ddp_trainer(sys.argv[4], sys.argv[5])
    else:
        result = run_program()
    print("RESULT " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
