#!/usr/bin/env python
"""Offline torch -> native weight ingestion for sparsefusion_tpu.

The reference distributes pretrained weights as torch checkpoints
(README.md:35-38): EFT (`ckpt_{cat}_eft.pt`), VLDM (`ckpt_{cat}.pt`),
SD-VAE (`sd-v1-3-vae.ckpt`), plus two implicit upstream dependencies —
torchvision ImageNet resnet18 (the EFT trunk, ``sparsefusion/eft.py:99``)
and LPIPS-VGG (``external/external_utils.py:11-49``).  This tool converts
any of them to flat ``.npz`` pytrees the JAX framework loads directly, so
the CLIs never need torch at run time.

Usage (any subset of flags):

    python tools/convert_weights.py --out-dir weights/ \
        --eft ckpt_hydrant_eft.pt --vldm ckpt_hydrant.pt \
        --vae sd-v1-3-vae.ckpt \
        --resnet18 resnet18-f37072fd.pth \
        --lpips-vgg vgg16-397923af.pth --lpips-lin lpips_vgg.pth

Outputs ``{eft,vldm,vae,resnet18,lpips}.npz``.  Load back with
``sparsefusion_tpu.train.checkpoints.load_npz_pytree`` (or pass the .pt
files straight to the demo/train CLIs, which call the same converters).
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def flatten_pytree(tree, prefix=""):
    """Nested dict -> {'a/b/c': ndarray} (npz-safe keys)."""
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(flatten_pytree(v, key + "/"))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten_pytree(flat):
    tree = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_npz_pytree(path: str, tree) -> None:
    np.savez(path, **flatten_pytree(tree))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out-dir", default="weights")
    p.add_argument("--eft", help="reference EFT ckpt (ckpt_{cat}_eft.pt)")
    p.add_argument("--vldm", help="reference VLDM ckpt (ckpt_{cat}.pt)")
    p.add_argument("--vae", help="SD VAE ckpt (sd-v1-3-vae.ckpt)")
    p.add_argument("--resnet18", help="torchvision resnet18 .pth")
    p.add_argument("--lpips-vgg", help="torchvision vgg16 .pth")
    p.add_argument("--lpips-lin", help="lpips vgg linear-head .pth")
    args = p.parse_args(argv)

    from sparsefusion_tpu.train import convert as C

    os.makedirs(args.out_dir, exist_ok=True)
    done = []

    if args.eft:
        sd = C.load_torch_state_dict(args.eft)
        save_npz_pytree(os.path.join(args.out_dir, "eft.npz"),
                        C.convert_eft_state_dict(sd))
        done.append("eft")

    if args.vldm:
        sd = C.load_torch_state_dict(args.vldm)
        save_npz_pytree(os.path.join(args.out_dir, "vldm.npz"),
                        C.convert_unet_state_dict(sd))
        done.append("vldm")

    if args.vae:
        sd = C.strip_sd_prefixes(
            C.load_torch_state_dict(args.vae, key="state_dict"))
        save_npz_pytree(os.path.join(args.out_dir, "vae.npz"),
                        C.convert_vae_state_dict(sd))
        done.append("vae")

    if args.resnet18:
        sd = C.load_torch_state_dict(args.resnet18, key=None)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        params, stats = C.convert_resnet18_trunk(sd, prefix="")
        save_npz_pytree(os.path.join(args.out_dir, "resnet18.npz"),
                        {"params": params, "batch_stats": stats})
        done.append("resnet18")

    if args.lpips_vgg and args.lpips_lin:
        import torch

        from sparsefusion_tpu.nn.lpips import convert_lpips_weights

        vgg_sd = torch.load(args.lpips_vgg, map_location="cpu",
                            weights_only=False)
        if hasattr(vgg_sd, "state_dict"):
            vgg_sd = vgg_sd.state_dict()
        lin_sd = torch.load(args.lpips_lin, map_location="cpu",
                            weights_only=False)
        if isinstance(lin_sd, dict) and "state_dict" in lin_sd:
            lin_sd = lin_sd["state_dict"]
        save_npz_pytree(os.path.join(args.out_dir, "lpips.npz"),
                        convert_lpips_weights(vgg_sd, lin_sd))
        done.append("lpips")
    elif args.lpips_vgg or args.lpips_lin:
        p.error("--lpips-vgg and --lpips-lin must be given together")

    if not done:
        p.error("nothing to convert — pass at least one checkpoint flag")
    print("converted:", ", ".join(done), "->", args.out_dir)


if __name__ == "__main__":
    main()
