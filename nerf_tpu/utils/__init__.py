"""Ops shell: checkpointing, timers, metrics, image IO, debug tools.

Capability parity (behavior, not code) with the reference's auxiliary
subsystems (SURVEY.md section 5):
  checkpoint.py  saveModel/loadFromFile + rotation (nerf_helper.py:7-15,
                 nerf_base.py:30-50, ddp_train.py:287-290)
  timer.py       sliding-window Timer + ETA strings (timer.py:11-28)
  metrics.py     tensorboard SummaryWriter in timestamped ./logs dirs
                 (utils.py:15-20) with a JSONL fallback
  image.py       uint8 conversion + image grid writer (save_image call sites,
                 train.py:255)
  debug.py       NaN detection switch (nan_hook, nerf_helper.py:26-36)
"""

from nerf_tpu.utils.checkpoint import CheckpointManager, load_checkpoint, save_checkpoint
from nerf_tpu.utils.debug import check_finite, nan_attribution, nan_debug
from nerf_tpu.utils.image import save_image_grid, to_uint8
from nerf_tpu.utils.metrics import MetricsWriter
from nerf_tpu.utils.timer import Timer

__all__ = [
    "CheckpointManager", "save_checkpoint", "load_checkpoint",
    "Timer", "MetricsWriter", "save_image_grid", "to_uint8",
    "nan_debug", "nan_attribution", "check_finite",
]
