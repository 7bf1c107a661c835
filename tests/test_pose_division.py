"""Tests for the pose-division tool and its integration with the MA sampler."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from pose_division import (  # noqa: E402
    divide_transforms, mix_division, sequential_division, spatial_division,
)


def _meta_from_positions(positions):
    frames = []
    for p in positions:
        tf = np.eye(4, dtype=np.float32)
        tf[:3, 3] = p
        frames.append({"file_path": "./train/r", "transform_matrix": tf.tolist()})
    return {"camera_angle_x": 0.69, "frames": frames}


class TestSpatialDivision:
    def test_quadrant_ids(self):
        pos = np.array([
            [-1, -1, 0],   # x<0,y<0 -> 0
            [-1, +1, 0],   # x<0,y>0 -> 1
            [+1, -1, 0],   # x>0,y<0 -> 2
            [+1, +1, 0],   # x>0,y>0 -> 3
        ], np.float32)
        division, weights = spatial_division(pos)
        assert division == [0, 1, 2, 3]
        assert weights == [0.25] * 4

    def test_mix_preserves_counts_on_balanced_input(self):
        rng = np.random.default_rng(0)
        pos = rng.normal(size=(40, 3)).astype(np.float32)
        division, _ = spatial_division(pos)
        mixed = mix_division(division, mix_num=2, seed=1)
        # swaps exchange ids pairwise -> per-division counts unchanged
        for d in range(4):
            assert mixed.count(d) == division.count(d)
        assert mixed != division  # something actually moved

    def test_mix_zero_is_identity(self):
        assert mix_division([0, 1, 2, 3], mix_num=0) == [0, 1, 2, 3]

    def test_sequential_split(self):
        division, weights = sequential_division(10)
        assert division == [0, 0, 1, 1, 2, 2, 3, 3, 3, 3]
        assert sum(weights) == pytest.approx(1.0)


class TestDivideTransforms:
    def test_json_fields_and_sampler_integration(self, tmp_path):
        rng = np.random.default_rng(3)
        pos = rng.normal(size=(16, 3)).astype(np.float32)
        out = divide_transforms(_meta_from_positions(pos), mix_num=1)
        assert set(out) >= {"division", "weights", "mix_num", "grouping", "frames"}
        assert len(out["division"]) == 16
        assert out["grouping"] == [[0, 2], [1, 3]]
        assert sum(out["weights"]) == pytest.approx(1.0)
        assert all(f["div_id"] == d for f, d in zip(out["frames"], out["division"]))

        # feeds straight into the MA sampler
        from nerf_tpu.data.sampler import LocalShuffleSampler

        samplers = [
            LocalShuffleSampler(16, out["division"], rank=r, allow_imbalance=True)
            for r in range(4)
        ]
        idx = np.concatenate([s.epoch_indices(0) for s in samplers])
        assert sorted(idx.tolist()) == list(range(16))

    def test_cli_end_to_end(self, tmp_path):
        rng = np.random.default_rng(5)
        pos = rng.normal(size=(12, 3)).astype(np.float32)
        ds = tmp_path / "lego"
        ds.mkdir()
        with open(ds / "transforms_train.json", "w") as f:
            json.dump(_meta_from_positions(pos), f)
        tool = os.path.join(os.path.dirname(__file__), "..", "tools",
                            "pose_division.py")
        r = subprocess.run(
            [sys.executable, tool, "--input_path", str(tmp_path),
             "--name", "lego", "--mix_num", "1"],
            capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        div_json = ds / "transforms_train_div.json"
        assert div_json.exists()
        meta = json.load(open(div_json))
        assert len(meta["division"]) == 12

        # idempotence: a divided file is detected and skipped
        with open(ds / "transforms_train.json", "w") as f:
            json.dump(meta, f)
        r2 = subprocess.run(
            [sys.executable, tool, "--input_path", str(tmp_path),
             "--name", "lego"], capture_output=True, text=True)
        assert "skipping" in r2.stdout
