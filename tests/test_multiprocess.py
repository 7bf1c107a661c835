"""True multi-process (multi-controller) execution test.

The reference runs multi-node via mp.spawn workers + NCCL env rendezvous
(/root/reference/ddp_train.py:66-67,320-323, model_average.py:72-73).  Here
the equivalent is jax.distributed.initialize: two OS processes, 4 virtual
CPU devices each, one global (2, 4) ('replica', 'data') mesh.  Both
processes run the same sharded DP-step + MA-average program
(tests/mp_program.py); the pytest process runs it single-controller over its
own 8 local devices as the oracle.  Multi-controller SPMD must compute the
same function — losses and parameter checksums must agree.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _parse_result(stdout: str):
    for line in stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise AssertionError(f"no RESULT line in worker output:\n{stdout}")


@pytest.mark.slow
def test_two_process_dp_step_and_ma_average_match_single_process():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    results = [_parse_result(o) for o in outs]

    # both processes observed the same global computation
    assert results[0] == results[1]

    # single-process oracle: same program on this process's 8 local devices
    from tests.mp_program import run_program

    oracle = run_program()
    assert np.isfinite(results[0]["loss"])
    np.testing.assert_allclose(results[0]["loss"], oracle["loss"], rtol=1e-5)
    np.testing.assert_allclose(results[0]["psnr"], oracle["psnr"], rtol=1e-5)
    np.testing.assert_allclose(results[0]["checksums"], oracle["checksums"],
                               rtol=1e-5)
