"""SparseFusion-TPU: a TPU-native (JAX/XLA/Pallas) sparse-view 3D reconstruction framework.

A from-scratch re-design of the capabilities of SparseFusion (CVPR '23,
arXiv 2212.00792): an epipolar feature transformer (EFT), a view-conditioned
latent diffusion model (VLDM) over Stable-Diffusion latents, and per-scene
instant-NGP distillation — all built TPU-first:

- compute path: JAX + Flax modules compiled by XLA, Pallas kernels for the
  hashgrid encoder hot loop,
- fixed-shape, scan-based samplers and renderers (no dynamic shapes),
- scaling via ``jax.sharding.Mesh`` + NamedSharding data parallelism instead
  of NCCL DDP.

Layout:
    core/       cameras (PyTorch3D-convention NDC math), rays, harmonic embeddings
    ops/        grid_sample, resize, hash/tiled grid encoding (XLA + Pallas)
    diffusion/  continuous-time Gaussian diffusion, DDPM losses, ancestral + PLMS samplers
    nn/         Flax modules: EFT, imagen-style UNet, SD VAE, NGP field
    render/     light-field (EFT) renderer and NGP volume renderer
    data/       CO3D / co3d_toy loaders (dict contract preserved)
    parallel/   device-mesh helpers, sharded train/eval steps
    train/      training loops, optimizers, checkpointing, torch-ckpt conversion
    distill/    per-scene diffusion-distillation loop
    cli/        demo/train front-ends (argparse-compatible with the reference)
"""

__version__ = "0.1.0"
