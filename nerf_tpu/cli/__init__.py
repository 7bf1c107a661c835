"""CLI layer: shared argparse surface + trainer loop + render-only mode.

Capability parity with the reference entry scripts (SURVEY.md section 2 items
1-3, 17-18): train.py, ddp_train.py, model_average.py, and render_only, all
sharing one flag parser (/root/reference/nerf/procedures.py:166-213).
"""

from nerf_tpu.cli.flags import config_from_args, get_parser
from nerf_tpu.cli.render import render_only
from nerf_tpu.cli.trainer import Trainer

__all__ = ["get_parser", "config_from_args", "Trainer", "render_only"]
