#!/usr/bin/env python
"""Import reference PyTorch checkpoints into nerf_tpu's format.

A user of the reference repo (Enigmatisms/NeRF) has `<name>_mip.pt` +
`<name>_prop.pt` files written by saveModel (nerf_helper.py:7-15) holding
torch state dicts. This tool maps them onto nerf_tpu's flax parameter pytree
(transposing torch's (out, in) Linear weights to flax's (in, out) kernels and
stripping DDP's 'module.' prefixes, nerf_base.py:34-38) and writes a single
nerf_tpu checkpoint that train.py -l / -r can consume.

Layer map (torch state_dict key -> flax path):
  vanilla ("MipNeRF", mip_model.py:15-38):
    lin_block1.{0,2,4,6}   -> block1/Dense_{0..3}
    lin_block2.{0,2,4}     -> block2/Dense_{0..2}
    opacity_head.0         -> opacity_head
    bottle_neck.0          -> bottle_neck
    rgb_layer.{0,2}        -> rgb_layer/Dense_{0,1}
  Ref-NeRF (ref_model.py:16-66):
    spa_block1.{0,2,4,6}   -> spa_block1/Dense_{0..3}
    spa_block2.{0,2,4,6}   -> spa_block2/Dense_{0..3}
    rho_tau_head           -> rho_tau_head
    norm_col_tint_head     -> norm_col_tint_head
    bottle_neck            -> bottle_neck
    dir_block1.{0,2,4,6}   -> dir_block1/Dense_{0..3}
    dir_block2.{0,2,4,6}   -> dir_block2/Dense_{0..3}
    spec_rgb_head.0        -> spec_rgb_head/Dense_0
  proposal (addtional.py:53-96):
    layers.{0,2,4,6}       -> MLP_0/Dense_{0..3}
    layers.8               -> MLP_1/Dense_0

Usage:
  python tools/import_torch_checkpoint.py --mip chkpt_300000_mip.pt \\
      --prop chkpt_300000_prop.pt --out model/model_1.ckpt [-t]
"""

from __future__ import annotations

import argparse

import numpy as np


def _strip_module(sd: dict) -> dict:
    return {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}


def _kb(sd: dict, key: str) -> dict:
    w = np.asarray(sd[f"{key}.weight"], np.float32)
    b = np.asarray(sd[f"{key}.bias"], np.float32)
    return {"kernel": w.T.copy(), "bias": b}


def _seq(sd: dict, prefix: str, torch_idxs, flax_names) -> dict:
    return {fn: _kb(sd, f"{prefix}.{ti}") for ti, fn in zip(torch_idxs, flax_names)}


def vanilla_params_from_torch(sd: dict) -> dict:
    sd = _strip_module(sd)
    d4 = [f"Dense_{i}" for i in range(4)]
    return {
        "block1": _seq(sd, "lin_block1", (0, 2, 4, 6), d4),
        "block2": _seq(sd, "lin_block2", (0, 2, 4), d4[:3]),
        "opacity_head": _kb(sd, "opacity_head.0"),
        "bottle_neck": _kb(sd, "bottle_neck.0"),
        "rgb_layer": _seq(sd, "rgb_layer", (0, 2), ("Dense_0", "Dense_1")),
    }


def refnerf_params_from_torch(sd: dict) -> dict:
    sd = _strip_module(sd)
    d4 = [f"Dense_{i}" for i in range(4)]
    return {
        "spa_block1": _seq(sd, "spa_block1", (0, 2, 4, 6), d4),
        "spa_block2": _seq(sd, "spa_block2", (0, 2, 4, 6), d4),
        "rho_tau_head": _kb(sd, "rho_tau_head"),
        "norm_col_tint_head": _kb(sd, "norm_col_tint_head"),
        "bottle_neck": _kb(sd, "bottle_neck"),
        "dir_block1": _seq(sd, "dir_block1", (0, 2, 4, 6), d4),
        "dir_block2": _seq(sd, "dir_block2", (0, 2, 4, 6), d4),
        "spec_rgb_head": {"Dense_0": _kb(sd, "spec_rgb_head.0")},
    }


def prop_params_from_torch(sd: dict) -> dict:
    sd = _strip_module(sd)
    return {
        "MLP_0": _seq(sd, "layers", (0, 2, 4, 6),
                      [f"Dense_{i}" for i in range(4)]),
        "MLP_1": {"Dense_0": _kb(sd, "layers.8")},
    }


def import_checkpoint(mip_path: str, prop_path: str, out_path: str,
                      ref_nerf: bool = False) -> dict:
    """Read the two reference .pt files, return + write the nerf_tpu state."""
    import torch

    mip = torch.load(mip_path, map_location="cpu", weights_only=False)
    prop = torch.load(prop_path, map_location="cpu", weights_only=False)
    mip_sd = {k: v.numpy() for k, v in mip["model"].items()}
    prop_sd = {k: v.numpy() for k, v in prop["model"].items()}

    nerf = (refnerf_params_from_torch(mip_sd) if ref_nerf
            else vanilla_params_from_torch(mip_sd))
    params = {"nerf": nerf, "prop": prop_params_from_torch(prop_sd)}

    from nerf_tpu.utils import save_checkpoint

    step = int(mip.get("train_cnt", 0))
    epoch = int(mip.get("epoch", 0))
    # written as a bare params checkpoint (no optimizer state: torch Adam
    # moments do not transfer onto optax's pytree layout)
    save_checkpoint(out_path, {"params": params}, step=step, epoch=epoch)
    print(f"Imported {mip_path} + {prop_path} (step {step}, epoch {epoch}) "
          f"-> {out_path}")
    return params


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--mip", required=True, help="<name>_mip.pt from the reference")
    p.add_argument("--prop", required=True, help="<name>_prop.pt from the reference")
    p.add_argument("--out", required=True, help="output .ckpt path")
    p.add_argument("-t", "--ref_nerf", default=False, action="store_true",
                   help="the mip file holds a Ref-NeRF model")
    args = p.parse_args()
    import_checkpoint(args.mip, args.prop, args.out, ref_nerf=args.ref_nerf)


if __name__ == "__main__":
    main()
