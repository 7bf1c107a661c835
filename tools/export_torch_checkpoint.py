#!/usr/bin/env python
"""Export nerf_tpu checkpoints to the reference's PyTorch .pt format.

Inverse of tools/import_torch_checkpoint.py: writes `<out>_mip.pt` +
`<out>_prop.pt` files in the reference saveModel layout
({"model": state_dict, "train_cnt", "epoch"}, nerf_helper.py:7-15) so a
model trained here can be rendered or fine-tuned with the reference repo.

Usage:
  python tools/export_torch_checkpoint.py --ckpt model/model_1.ckpt \\
      --out chkpt_exported [-t]
"""

from __future__ import annotations

import argparse

import numpy as np


def _kb_to_torch(layer: dict, prefix: str, out: dict):
    import torch

    out[f"{prefix}.weight"] = torch.from_numpy(
        np.ascontiguousarray(np.asarray(layer["kernel"], np.float32).T))
    out[f"{prefix}.bias"] = torch.from_numpy(
        np.asarray(layer["bias"], np.float32).reshape(-1))


def _seq_to_torch(tree: dict, prefix: str, torch_idxs, flax_names, out: dict):
    for ti, fn in zip(torch_idxs, flax_names):
        _kb_to_torch(tree[fn], f"{prefix}.{ti}", out)


def vanilla_to_torch_sd(params: dict) -> dict:
    out: dict = {}
    d4 = [f"Dense_{i}" for i in range(4)]
    _seq_to_torch(params["block1"], "lin_block1", (0, 2, 4, 6), d4, out)
    _seq_to_torch(params["block2"], "lin_block2", (0, 2, 4), d4[:3], out)
    _kb_to_torch(params["opacity_head"], "opacity_head.0", out)
    _kb_to_torch(params["bottle_neck"], "bottle_neck.0", out)
    _seq_to_torch(params["rgb_layer"], "rgb_layer", (0, 2),
                  ("Dense_0", "Dense_1"), out)
    return out


def refnerf_to_torch_sd(params: dict) -> dict:
    out: dict = {}
    d4 = [f"Dense_{i}" for i in range(4)]
    _seq_to_torch(params["spa_block1"], "spa_block1", (0, 2, 4, 6), d4, out)
    _seq_to_torch(params["spa_block2"], "spa_block2", (0, 2, 4, 6), d4, out)
    _kb_to_torch(params["rho_tau_head"], "rho_tau_head", out)
    _kb_to_torch(params["norm_col_tint_head"], "norm_col_tint_head", out)
    _kb_to_torch(params["bottle_neck"], "bottle_neck", out)
    _seq_to_torch(params["dir_block1"], "dir_block1", (0, 2, 4, 6), d4, out)
    _seq_to_torch(params["dir_block2"], "dir_block2", (0, 2, 4, 6), d4, out)
    _kb_to_torch(params["spec_rgb_head"]["Dense_0"], "spec_rgb_head.0", out)
    return out


def prop_to_torch_sd(params: dict) -> dict:
    out: dict = {}
    _seq_to_torch(params["MLP_0"], "layers", (0, 2, 4, 6),
                  [f"Dense_{i}" for i in range(4)], out)
    _kb_to_torch(params["MLP_1"]["Dense_0"], "layers.8", out)
    return out


def export_checkpoint(ckpt_path: str, out_prefix: str,
                      ref_nerf: bool = False):
    """Read a nerf_tpu checkpoint, write <out>_mip.pt + <out>_prop.pt."""
    import torch

    from nerf_tpu.utils import load_checkpoint

    state, step, epoch = load_checkpoint(ckpt_path)
    params = state["params"]
    nerf_sd = (refnerf_to_torch_sd(params["nerf"]) if ref_nerf
               else vanilla_to_torch_sd(params["nerf"]))
    torch.save({"model": nerf_sd, "train_cnt": step, "epoch": epoch},
               f"{out_prefix}_mip.pt")
    if "prop" in params:
        torch.save({"model": prop_to_torch_sd(params["prop"]),
                    "train_cnt": step, "epoch": epoch},
                   f"{out_prefix}_prop.pt")
    print(f"Exported {ckpt_path} (step {step}) -> {out_prefix}_{{mip,prop}}.pt")


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--ckpt", required=True, help="nerf_tpu .ckpt path")
    p.add_argument("--out", required=True, help="output prefix for the .pt files")
    p.add_argument("-t", "--ref_nerf", default=False, action="store_true")
    args = p.parse_args()
    export_checkpoint(args.ckpt, args.out, ref_nerf=args.ref_nerf)


if __name__ == "__main__":
    main()
