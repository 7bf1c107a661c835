"""Training metrics writer: tensorboard + JSONL in timestamped run dirs.

Behavior parity with getSummaryWriter (/root/reference/nerf/utils.py:15-20):
timestamped run directory under ``./logs/<date>/<time>-epoch{N}/``, optional
delete-on-start. The tensorboard backend is optional (headless TPU pods may
not want it); every scalar is always mirrored to a ``metrics.jsonl`` so runs
remain machine-readable without tensorboard.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Optional


def _make_run_dir(base: str, epochs: int, del_dir: bool) -> str:
    if del_dir and os.path.exists(base):
        shutil.rmtree(base)
    stamp = time.localtime()
    day = time.strftime("%Y%m%d", stamp)
    clk = time.strftime("%H%M%S", stamp)
    path = os.path.join(base, day, f"{clk}-epoch{epochs}")
    os.makedirs(path, exist_ok=True)
    return path


class MetricsWriter:
    """Scalar metrics sink; tensorboard if available, JSONL always."""

    def __init__(self, base_dir: str = "./logs", epochs: int = 0,
                 del_dir: bool = False, use_tensorboard: bool = True,
                 run_dir: Optional[str] = None, enabled: bool = True):
        # enabled=False -> a no-op sink: non-zero processes in multi-process
        # runs log nothing (rank-0 gating, ddp_train.py:169,258 parity)
        self.enabled = enabled
        if not enabled:
            self.run_dir, self._jsonl, self._tb = None, None, None
            return
        self.run_dir = run_dir or _make_run_dir(base_dir, epochs, del_dir)
        os.makedirs(self.run_dir, exist_ok=True)
        self._jsonl = open(os.path.join(self.run_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=self.run_dir)
            except Exception:
                self._tb = None

    def add_scalar(self, tag: str, value, step: int) -> None:
        if not self.enabled:
            return
        value = float(value)
        self._jsonl.write(json.dumps(
            {"tag": tag, "value": value, "step": int(step), "ts": time.time()}
        ) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def add_scalars(self, scalars: dict, step: int, prefix: str = "") -> None:
        for tag, value in scalars.items():
            self.add_scalar(prefix + tag, value, step)

    def flush(self) -> None:
        if not self.enabled:
            return
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        if not self.enabled:
            return
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
