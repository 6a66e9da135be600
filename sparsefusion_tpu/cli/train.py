"""Training entry point (reference ``train.py`` front-end).

    python -m sparsefusion_tpu.cli.train -c hydrant -d synthetic

Replaces mp.spawn + DDP/NCCL with a jitted data-parallel train step over
the device mesh (``train.py:258-295`` -> ``parallel/mesh.py``).  Each step
consumes one scene per device; visualization grids and checkpoints are
written on host 0 like the reference (vis every ``vis_itr``, checkpoint
every ``save_itr``, ``train.py:446-463``).
"""
from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--category", type=str, required=True)
    p.add_argument("-r", "--root", type=str, default="data/co3d")
    p.add_argument("-d", "--dataset_name", type=str, default="co3d",
                   choices=["co3d", "co3d_toy", "synthetic"])
    p.add_argument("-e", "--exp_name", type=str, default="sf")
    p.add_argument("-b", "--backend", type=str, default="xla",
                   help="compat flag; collectives always ride XLA/ICI")
    p.add_argument("--steps", type=int, default=50000)
    p.add_argument("--lr", type=float, default=5e-5)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--context_size", type=int, default=0,
                   help="fixed context size; 0 (default) samples 2-5 per "
                        "step like the reference (train.py:340-343) — at "
                        "most 4 compiled step variants")
    p.add_argument("--diffusion_batch_size", type=int, default=12)
    p.add_argument("--train_eft", action="store_true", default=True)
    p.add_argument("--no_train_eft", dest="train_eft", action="store_false")
    p.add_argument("--vae", type=str, default="-DNE")
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--save_itr", type=int, default=1000)
    p.add_argument("--vis_itr", type=int, default=100)
    p.add_argument("--exp_dir", type=str, default="output/train/")
    p.add_argument("--preset", type=str, default="sf",
                   choices=["sf", "tiny"],
                   help="'tiny' swaps in small model configs (smoke tests)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 UNet activations in the train step "
                        "(master params/optimizer/loss stay f32) — the "
                        "TPU mixed-precision recipe, analogous to the "
                        "reference's fp16 autocast")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans: error at the first op "
                        "producing a NaN with its provenance (the "
                        "torch.autograd.set_detect_anomaly analogue, "
                        "reference train.py:327)")
    args = p.parse_args(argv)
    args.vae_ckpt = None if args.vae == "-DNE" else args.vae
    return args


def main(argv=None):
    args = parse_args(argv)
    from sparsefusion_tpu.utils.runtime import (
        enable_persistent_compilation_cache,
    )

    from sparsefusion_tpu.parallel.mesh import maybe_init_distributed

    maybe_init_distributed()
    enable_persistent_compilation_cache()
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    from sparsefusion_tpu.cli.demo import load_dataset
    from sparsefusion_tpu.models import build_models, count_params
    from sparsefusion_tpu.parallel.mesh import (
        make_mesh,
        replicate_to_mesh,
        shard_batch,
    )
    from sparsefusion_tpu.train.checkpoints import (
        maybe_import_reference_weights,
        restore_checkpoint,
        save_checkpoint,
    )
    from sparsefusion_tpu.train.trainer import (
        TrainConfig,
        make_optimizers,
        make_train_step,
        notfinite_count,
        prepare_scene_batch,
    )

    exp_dir = os.path.join(args.exp_dir, args.exp_name, args.category)
    os.makedirs(exp_dir, exist_ok=True)

    if args.preset == "tiny":
        from sparsefusion_tpu.diffusion.ddpm import DDPMConfig
        from sparsefusion_tpu.nn.unet import UNetConfig
        from sparsefusion_tpu.nn.vae import VAEConfig

        models = build_models(
            jax.random.PRNGKey(0), latent_size=args.image_size // 8,
            unet_config=UNetConfig(
                dim=32, dim_mults=(1, 2), num_resnet_blocks=(1, 1),
                layer_attns=(False, True),
                layer_cross_attns=(False, False),
                cond_images_channels=256, attn_heads=2, attn_dim_head=8),
            vae_config=VAEConfig(ch=32, ch_mult=(1, 1, 2, 2),
                                 num_res_blocks=1),
            ddpm_config=DDPMConfig(channels=4,
                                   image_size=args.image_size // 8,
                                   timesteps=100))
    else:
        models = build_models(jax.random.PRNGKey(0),
                              latent_size=args.image_size // 8)
    models = maybe_import_reference_weights(models, None, args.vae_ckpt,
                                            None)
    print(f"UNet has {count_params(models.unet_params) * 1e-6:.2f} M params")

    dataset = load_dataset(args)

    # context_size=0 -> sample 2..5 per step (reference train.py:340-343);
    # each size is a separate static shape, so at most 4 compiled variants
    context_sizes = ([args.context_size] if args.context_size > 0
                     else [2, 3, 4, 5])
    cfg = TrainConfig(lr=args.lr, context_size=max(context_sizes),
                      diffusion_batch_size=args.diffusion_batch_size,
                      train_eft=args.train_eft,
                      latent_size=args.image_size // 8,
                      compute_dtype="bfloat16" if args.bf16
                      else "float32")
    tx, eft_tx = make_optimizers(cfg)
    mesh = make_mesh()
    n_dev = len(jax.devices())
    step_fn = make_train_step(models, cfg, tx, eft_tx, mesh=mesh)

    state = {
        "unet_params": models.unet_params,
        "eft_params": models.eft_vars["params"],
        "opt_state": tx.init(models.unet_params),
        "eft_opt_state": eft_tx.init(models.eft_vars["params"])
        if cfg.train_eft else None,
    }
    start_step = 0
    if args.resume:
        restored = restore_checkpoint(args.resume,
                                      target={"step": 0, **state})
        start_step = int(restored.pop("step", 0))
        state.update(restored)
        print(f"resumed from {args.resume} at step {start_step}")
    state = replicate_to_mesh(state, mesh)

    host = np.random.RandomState(jax.process_index())
    rng = jax.random.PRNGKey(1234 + jax.process_index())
    n_skipped = 0
    t0 = time.time()
    for step in range(start_step, args.steps):
        scene_ids = host.randint(len(dataset), size=n_dev)
        scenes = [dataset[int(s)] for s in scene_ids]
        query = [int(host.randint(len(s))) for s in scenes]
        cs = context_sizes[host.randint(len(context_sizes))]
        ctx = []
        for s, q in zip(scenes, query):
            pool = [i for i in range(len(s))]
            host.shuffle(pool)
            ctx.append(pool[:cs])
        batch = shard_batch(prepare_scene_batch(scenes, query, ctx), mesh)
        rng, k = jax.random.split(rng)
        state, aux = step_fn(state, batch, k)

        if step % 50 == 0 and jax.process_index() == 0:
            loss = float(aux["loss"])
            sps = (step - start_step + 1) / (time.time() - t0)
            print(f"step {step} loss {loss:.4f} ({sps:.2f} steps/s)")
            # non-finite-guard diagnostics (train.py:426-432 analogue):
            # name the scenes in the batch so a bad sequence is traceable
            skipped = notfinite_count(state["opt_state"])
            if skipped > n_skipped:
                print(f"WARNING: {skipped - n_skipped} update(s) skipped "
                      f"on non-finite grads (total {skipped}); last batch "
                      f"scenes {list(map(int, scene_ids))}")
                n_skipped = skipped

        # visualization grids (train.py:452-455 equivalent)
        if args.vis_itr > 0 and step % args.vis_itr == 0 and step > 0 \
                and jax.process_index() == 0:
            try:
                from sparsefusion_tpu.core.cameras import get_camera_slice
                from sparsefusion_tpu.train.visualize import (
                    save_visualization,
                )

                host_state = jax.device_get(state)
                scene = scenes[0]
                cams = scene.cameras()
                from sparsefusion_tpu.core.cameras import (
                    get_relative_cameras,
                )
                rel = get_relative_cameras(cams, [query[0]])
                import numpy as _np

                centers = -_np.einsum(
                    "ni,nij->nj", _np.asarray(rel.T), _np.asarray(rel.R))
                dist = float(_np.mean(_np.linalg.norm(centers, axis=1)))
                save_visualization(
                    models, host_state["unet_params"],
                    host_state["eft_params"],
                    get_camera_slice(rel, [query[0]]),
                    jax.numpy.asarray(scene.images[query[0]]),
                    get_camera_slice(rel, ctx[0]),
                    jax.numpy.asarray(scene.images[ctx[0]]),
                    dist - 5.0, dist + 5.0,
                    os.path.join(exp_dir, f"vis_{step:06d}.jpg"),
                    k, latent_hw=cfg.latent_size)
                print("visualizing", args.exp_name, args.category)
            except Exception as e:  # vis must never kill training
                print("vis failed:", e)
        if step % args.save_itr == 0 and step > 0 \
                and jax.process_index() == 0:
            save_checkpoint(os.path.join(exp_dir, "ckpt_latest"),
                            {"step": step, **jax.device_get(state)})
            print("saving model at step", step)

    if jax.process_index() == 0:
        save_checkpoint(os.path.join(exp_dir, "ckpt_latest"),
                        {"step": args.steps, **jax.device_get(state)})


if __name__ == "__main__":
    main()
