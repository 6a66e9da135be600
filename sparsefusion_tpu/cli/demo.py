"""Demo / evaluation entry point (reference ``demo.py`` front-end).

Argparse-compatible with the reference (``demo.py:106-180``):

    python -m sparsefusion_tpu.cli.demo -d co3d_toy -c hydrant -i 0 -v 2

Differences from the torch original:
* multi-process NCCL spawn is replaced by process-level scene sharding —
  under multi-host JAX each process takes ``split_list(val_list,
  n_processes)[process_index]`` (the reference's demo.py:59 semantics);
* ``-d synthetic`` runs the full pipeline on procedurally generated
  scenes so the demo works without the CO3D download;
* checkpoints are imported from the reference torch formats when the
  given paths exist, otherwise models start from scratch (stated loudly).

Per-scene input-view selection reproduces the reference's seeding exactly
(torch.Generator().manual_seed(val_seed + val_idx), demo.py:78-81).
"""
from __future__ import annotations

import argparse
import os
import sys

import jax
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--category", type=str, required=True)
    p.add_argument("-r", "--root", type=str, default="data/co3d_toy")
    p.add_argument("-d", "--dataset_name", type=str, default="co3d_toy",
                   choices=["co3d_toy", "co3d", "synthetic"])
    p.add_argument("-e", "--eft", type=str, default="-DNE")
    p.add_argument("-l", "--vldm", type=str, default="-DNE")
    p.add_argument("-a", "--vae", type=str, default="-DNE")
    p.add_argument("-i", "--idx", type=str, default="-DNE")
    p.add_argument("-v", "--input_views", type=int, default=2)
    p.add_argument("-g", "--gpus", type=int, default=1,
                   help="kept for reference-CLI compat; sharding follows "
                        "jax.process_count()")
    p.add_argument("-p", "--port", type=int, default=1)
    p.add_argument("--exp_dir", type=str, default="output/demo/")
    p.add_argument("--max_itr", type=int, default=3000)
    p.add_argument("--start_fusion", type=int, default=1000,
                   help="iteration after which the diffusion fusion loss "
                        "replaces the EFT bootstrap (reference fixes 1000, "
                        "distillation.py:156; exposed for short runs)")
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--no_diffusion", action="store_true")
    p.add_argument("--lpips_weights", type=str, default=None,
                   help="converted LPIPS npz (tools/convert_weights.py) OR "
                        "a pair 'vgg16.pth,lpips_vgg.pth' of torch files; "
                        "enables the perceptual fusion term + LPIPS eval")
    p.add_argument("--resnet18", type=str, default=None,
                   help="torchvision resnet18 state dict (.pth) for the "
                        "EFT trunk (reference eft.py:99 pretrained=True)")
    p.add_argument("--preset", type=str, default="auto",
                   choices=["auto", "reference", "tpu"],
                   help="'tpu' = occupancy-guided 32+32 sampling, 8x4 "
                        "bf16 tables (measured-fastest); 'reference' = "
                        "exact torch-ngp opt; 'auto' = tpu on TPU")
    p.add_argument("--no_fused", action="store_true",
                   help="disable the fused per-iteration dispatch "
                        "programs (DistillConfig.fused_steps; default "
                        "auto: on for TPU, off on CPU); only affects "
                        "the sequential loop — scene batches >1 use "
                        "distill/batched.py, which has no fused path")
    p.add_argument("--scene_batch", type=int, default=1,
                   help="distill up to N scenes per chip in lockstep "
                        "(vmapped scene axis, distill/batched.py); scenes "
                        "are bucketed by (frame count, image size) and "
                        "leftovers fall back to the sequential loop")
    args = p.parse_args(argv)

    # reference default parameter block (demo.py:140-158)
    args.timesteps = 500
    args.z_scale_factor = 0.18215
    args.val_seed = 0
    args.context_views = args.input_views
    args.val_list = [0]
    if args.idx != "-DNE":
        try:
            args.val_list = [int(s) for s in args.idx.split(",")]
        except ValueError:
            print("ERROR: -i --idx arg invalid, please use form 1,2,3")
            sys.exit(1)

    args.eft_ckpt = None if args.eft == "-DNE" else args.eft
    args.vae_ckpt = None if args.vae == "-DNE" else args.vae
    args.vldm_ckpt = None if args.vldm == "-DNE" else args.vldm
    return args


def select_input_views(val_seed: int, val_idx: int, n_frames: int,
                       n_views: int):
    """Seeded view selection with torch RNG parity (demo.py:78-81)."""
    try:
        import torch

        g = torch.Generator()
        g.manual_seed(val_seed + val_idx)
        perm = torch.randperm(n_frames, generator=g)
        return perm[:n_views].long().tolist()
    except ImportError:
        rng = np.random.RandomState(val_seed + val_idx)
        return rng.permutation(n_frames)[:n_views].tolist()


def load_dataset(args):
    if args.dataset_name == "synthetic":
        from sparsefusion_tpu.data.synthetic import SyntheticDataset

        n_scenes = max(getattr(args, "val_list", [3])) + 1
        return SyntheticDataset(n_scenes=n_scenes, n_views=10,
                                image_size=args.image_size)
    if args.dataset_name == "co3d_toy":
        from sparsefusion_tpu.data.co3d_toy import CO3DToyDataset

        return CO3DToyDataset(args.root, args.category)
    from sparsefusion_tpu.data.co3d import CO3Dv2Dataset

    return CO3Dv2Dataset(args.root, args.category, subset="fewview_dev",
                         stage="test", image_size=args.image_size)


def main(argv=None):
    args = parse_args(argv)
    from sparsefusion_tpu.cli.check_args import check_args
    from sparsefusion_tpu.parallel.mesh import maybe_init_distributed
    from sparsefusion_tpu.utils.runtime import (
        enable_persistent_compilation_cache,
    )

    check_args(args)
    maybe_init_distributed()
    enable_persistent_compilation_cache()
    from sparsefusion_tpu.distill.loop import (
        DistillConfig,
        distillation_loop,
        tpu_distill_config,
    )
    from sparsefusion_tpu.models import build_models
    from sparsefusion_tpu.nn.lpips import build_lpips_fn
    from sparsefusion_tpu.parallel.mesh import shard_scene_list
    from sparsefusion_tpu.train.checkpoints import (
        import_resnet18_trunk,
        maybe_import_reference_weights,
    )

    os.makedirs(args.exp_dir, exist_ok=True)
    for sub in ("log", "metrics", "render_imgs", "render_gifs"):
        os.makedirs(os.path.join(args.exp_dir, sub), exist_ok=True)

    if args.no_diffusion:
        # NGP-only path: the EFT/VAE/UNet trio is never applied, and
        # building it costs minutes of host tracing — skip it entirely
        models = None
    else:
        models = build_models(jax.random.PRNGKey(0))
        models = maybe_import_reference_weights(
            models, args.eft_ckpt, args.vae_ckpt, args.vldm_ckpt)
        if args.eft_ckpt is None:
            # the reference EFT always starts from an ImageNet trunk
            # (eft.py:99); without an EFT ckpt, load it separately if given
            models = import_resnet18_trunk(models, args.resnet18)
    lpips_fn = build_lpips_fn(args.lpips_weights)

    dataset = load_dataset(args)
    n_proc = jax.process_count()
    val_list = shard_scene_list(args.val_list, n_proc, jax.process_index())
    print(f"process {jax.process_index()}: assigned idx {val_list}")

    preset = args.preset
    if preset == "auto":
        preset = "tpu" if jax.default_backend() == "tpu" else "reference"
    if preset == "tpu":
        cfg = tpu_distill_config(max_itr=args.max_itr,
                                 start_fusion_step=args.start_fusion)
    else:
        cfg = DistillConfig(max_itr=args.max_itr,
                            start_fusion_step=args.start_fusion)
    if args.no_fused:
        import dataclasses

        cfg = dataclasses.replace(cfg, fused_steps=False)

    # materialize this process's scenes + per-scene input views
    entries = []
    for val_idx in val_list:
        scene = dataset[val_idx]
        input_idx = select_input_views(args.val_seed, val_idx, len(scene),
                                       args.context_views)
        print("val_idx", val_idx, input_idx)
        scene.sequence_name = \
            f"{args.category}_{val_idx:03d}_c{len(input_idx)}"
        entries.append((val_idx, scene, input_idx))

    # one scene per LOCAL device by default (the reference's
    # one-scene-per-GPU mp.spawn semantics, demo.py:18-60): on a
    # multi-chip host the batched loop shards its scene axis over a
    # local mesh so N scenes distill concurrently instead of
    # sequentially on one chip while the rest idle
    n_local = jax.local_device_count()
    scene_batch = args.scene_batch
    if scene_batch == 1 and n_local > 1 and len(entries) > 1:
        scene_batch = n_local
        print(f"auto scene_batch={n_local}: one scene per local device")
    local_mesh = None
    if n_local > 1 and scene_batch > 1:
        from sparsefusion_tpu.parallel.mesh import make_mesh

        local_mesh = make_mesh(jax.local_devices())

    groups = [[e] for e in entries]
    if scene_batch > 1:
        # bucket by (n_frames, image_size, n_ctx) — the batched loop's
        # stacking contract — then chunk to scene_batch
        buckets = {}
        for e in entries:
            key = (len(e[1]), e[1].images.shape[1], len(e[2]))
            buckets.setdefault(key, []).append(e)
        groups = []
        for bucket in buckets.values():
            for i in range(0, len(bucket), scene_batch):
                groups.append(bucket[i:i + scene_batch])

    for group in groups:
        if len(group) == 1:
            val_idx, scene, input_idx = group[0]
            distillation_loop(
                models, scene, input_idx, cfg,
                jax.random.PRNGKey(args.val_seed + val_idx),
                save_dir=args.exp_dir,
                use_diffusion=not args.no_diffusion,
                lpips_fn=lpips_fn)
        else:
            from sparsefusion_tpu.distill.batched import (
                batched_distillation_loop,
            )

            print(f"scene batch: {[g[0] for g in group]}")
            batched_distillation_loop(
                models, [g[1] for g in group], [g[2] for g in group],
                cfg, jax.random.PRNGKey(args.val_seed + group[0][0]),
                save_dir=args.exp_dir,
                use_diffusion=not args.no_diffusion,
                lpips_fn=lpips_fn, mesh=local_mesh)


if __name__ == "__main__":
    main()
