#!/usr/bin/env python
"""Offline pose-division tool for model-averaged training.

Capability parity (behavior, not code) with
/root/reference/pose_viz/pose_selection.py:52-142:
  * quadrant-based spatial division of training poses by the sign bits of the
    camera position's (x, y): div_id = (x>0)<<1 + (y>0) (:52-62);
  * optional random mixing of boundary poses between quadrant-adjacent
    divisions so replicas see some of each other's region (:64-95);
  * sequential quarter split as the non-neighbor fallback (:124-133);
  * writes transforms_train_div.json with `division`, `weights`, `mix_num`,
    `grouping`, and per-frame `div_id` (:133-142).

Differences: the Open3D GUI is replaced by an optional matplotlib top-down
scatter (--plot); randomness is a seeded numpy Generator (the reference used
the global `random` module with seed 114514).

Usage:
  python tools/pose_division.py --input_path ./data --name lego
  python tools/pose_division.py --input_path ./data --name lego --mix_num 3 --plot
"""

from __future__ import annotations

import argparse
import json
import os
from copy import deepcopy

import numpy as np


def spatial_division(positions: np.ndarray):
    """Quadrant ids + weights from camera (x, y) sign bits.

    positions: (N, 3) camera centers. Returns (division list, weights list).
    quadrant mapping: 3->00, 2->01, 4->10, 1->11 (pose_selection.py:56-57).
    """
    division = (((positions[:, 0] > 0).astype(np.int32) << 1)
                + (positions[:, 1] > 0)).tolist()
    cnts = [division.count(i) for i in range(4)]
    total = sum(cnts)
    weights = [c / total for c in cnts]
    return division, weights


def mix_division(division, mix_num: int = 3, seed: int = 114514,
                 one_side: bool = True):
    """Swap ``mix_num`` random poses between quadrant-adjacent divisions.

    Adjacency follows the reference's exchange pattern (pose_selection.py:
    76-93): division 0 trades with 2, and 3 trades with 1; under
    ``one_side=False`` each also trades with its other neighbor (0<->1,
    3<->2). Swapping relabels the chosen poses with the neighbor's id.
    """
    if mix_num == 0:
        return list(division)
    rng = np.random.default_rng(seed)
    pairs = [(0, 2), (3, 1)]
    if not one_side:
        pairs += [(0, 1), (3, 2)]
    out = np.asarray(division, np.int32).copy()
    for a, b in pairs:
        # select from the CURRENT labels so a pose already traded by an
        # earlier pair cannot be re-picked and overwritten (which would
        # unbalance the exchange under --two_side)
        ia = np.nonzero(out == a)[0]
        ib = np.nonzero(out == b)[0]
        k = min(mix_num, len(ia), len(ib))
        if k == 0:
            continue
        sa = rng.choice(ia, size=k, replace=False)
        sb = rng.choice(ib, size=k, replace=False)
        out[sa] = b
        out[sb] = a
    return out.tolist()


def sequential_division(n: int):
    """Equal contiguous quarter split (pose_selection.py:124-133)."""
    quarter = n >> 2
    division = []
    weights = []
    for i in range(3):
        division += [i] * quarter
        weights.append(quarter / n)
    last = n - 3 * quarter
    division += [3] * last
    weights.append(last / n)
    return division, weights


def divide_transforms(meta: dict, neighbor: bool = True, mix_num: int = 3,
                      seed: int = 114514, one_side: bool = True) -> dict:
    """Return a copy of the transforms json with division metadata added."""
    positions = np.asarray(
        [np.asarray(f["transform_matrix"], np.float32)[:3, 3]
         for f in meta["frames"]]
    )
    out = deepcopy(meta)
    if neighbor:
        division, _ = spatial_division(positions)
        division = mix_division(division, mix_num, seed, one_side)
        # weights reflect the post-mix memberships
        cnts = [division.count(i) for i in range(4)]
        weights = [c / len(division) for c in cnts]
        grouping = [[0, 2], [1, 3]]
    else:
        division, weights = sequential_division(len(positions))
        grouping = []
    out["division"] = division
    out["weights"] = weights
    out["mix_num"] = mix_num
    out["grouping"] = grouping
    for i, d in enumerate(division):
        out["frames"][i]["div_id"] = int(d)
    return out


def plot_divisions(positions: np.ndarray, division, path: str):
    """Top-down (x, y) scatter colored by division id."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    division = np.asarray(division)
    fig, ax = plt.subplots(figsize=(6, 6))
    for d in range(int(division.max()) + 1):
        m = division == d
        ax.scatter(positions[m, 0], positions[m, 1], label=f"div {d}", s=24)
    ax.axhline(0, color="gray", lw=0.5)
    ax.axvline(0, color="gray", lw=0.5)
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    ax.legend()
    ax.set_title("camera positions by division (top-down)")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--input_path", type=str, default="./data",
                   help="directory containing <name>/")
    p.add_argument("--output_path", type=str, default=None,
                   help="defaults to input_path")
    p.add_argument("--name", type=str, default="lego")
    p.add_argument("--filename", type=str, default="transforms_train.json")
    p.add_argument("--mix_num", type=int, default=3,
                   help="boundary poses to trade per division pair (0 = none)")
    p.add_argument("--seed", type=int, default=114514)
    p.add_argument("--neighbor", dest="neighbor", default=True,
                   action="store_true", help="spatial quadrant division")
    p.add_argument("--sequential", dest="neighbor", action="store_false",
                   help="contiguous quarter split instead")
    p.add_argument("--two_side", default=False, action="store_true",
                   help="mix with both adjacent quadrants")
    p.add_argument("--plot", default=False, action="store_true",
                   help="write a top-down division scatter png")
    opts = p.parse_args()

    in_path = os.path.join(opts.input_path, opts.name, opts.filename)
    out_root = opts.output_path or opts.input_path
    out_path = os.path.join(out_root, opts.name,
                            opts.filename[:-5] + "_div.json")
    with open(in_path) as f:
        meta = json.load(f)
    if "mix_num" in meta:
        print("Found pre-computed division, skipping...")
        return
    out = divide_transforms(meta, neighbor=opts.neighbor,
                            mix_num=opts.mix_num, seed=opts.seed,
                            one_side=not opts.two_side)
    print("Weights:", out["weights"])
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=4)
    print(f"Wrote {out_path}")
    if opts.plot:
        positions = np.asarray(
            [np.asarray(fr["transform_matrix"], np.float32)[:3, 3]
             for fr in meta["frames"]])
        png = out_path[:-5] + ".png"
        plot_divisions(positions, out["division"], png)
        print(f"Wrote {png}")


if __name__ == "__main__":
    main()
