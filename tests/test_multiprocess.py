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
@pytest.mark.parametrize("mode,expect_step", [("trainer", 2),
                                              ("trainer_ddp", 2)])
def test_two_process_trainer_matches_single_process(tmp_path_factory, mode,
                                                    expect_step):
    """The FULL Trainer (MA and DDP modes) across 2 processes — staging,
    sharded epoch scan, collectives, rank-0 checkpointing — must produce the
    same final params as the identical single-process run."""
    from nerf_tpu.data.synthetic import make_synthetic_scene, write_blender_dataset

    data_root = tmp_path_factory.mktemp("mp_data")
    train, test, (tr_p, te_p) = make_synthetic_scene(
        n_train=8, n_test=2, hw=(16, 16), seed=0, n_samples=24)
    write_blender_dataset(str(data_root / "lego"), train, tr_p, "train")
    write_blender_dataset(str(data_root / "lego"), test, te_p, "test")
    wd = {pid: tmp_path_factory.mktemp(f"mp_wd{pid}") for pid in (0, 1, 2)}

    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), mode,
             str(data_root), str(wd[pid])],
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
    assert results[0] == results[1]
    assert results[0]["step"] == expect_step

    # rank 0 (and only rank 0) wrote the final checkpoint + logs
    assert os.path.exists(wd[0] / "model" / "model_1.ckpt")
    assert not os.path.exists(wd[1] / "model")

    # single-process oracle, same args on this process's 8 local devices
    cwd = os.getcwd()
    try:
        from tests.mp_program import run_ddp_trainer, run_ma_trainer

        runner = run_ma_trainer if mode == "trainer" else run_ddp_trainer
        oracle = runner(str(data_root), str(wd[2]))
    finally:
        os.chdir(cwd)
    np.testing.assert_allclose(results[0]["checksums"], oracle["checksums"],
                               rtol=1e-5)


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
