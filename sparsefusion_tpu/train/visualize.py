"""Training visualization: input/target/EFT-render/diffusion-sample grids.

Equivalent of ``train.py:36-114`` (``save_visualization``): every
``vis_itr`` steps, dump a side-by-side grid of context views, the query
ground truth, the EFT light-field render, and an ancestral diffusion
sample decoded through the VAE.  Visual artifacts are the reference's
de-facto test suite (SURVEY.md section 4), so these dumps are first-class.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sparsefusion_tpu.core.cameras import Cameras
from sparsefusion_tpu.models import SparseFusionModels
from sparsefusion_tpu.ops.image import resize_bilinear
from sparsefusion_tpu.render.lightfield import render_light_field
from sparsefusion_tpu.utils.image import to_uint8


def save_visualization(
    models: SparseFusionModels,
    unet_params,
    eft_params,
    query_cam: Cameras,
    query_rgb: jnp.ndarray,
    context_cams: Cameras,
    context_rgb: jnp.ndarray,
    min_depth: float,
    max_depth: float,
    out_path: str,
    rng: jax.Array,
    latent_hw: int = 32,
    sample_timesteps: Optional[int] = 64,
):
    """Write a [contexts | gt | eft render | diffusion sample] grid jpg."""
    import imageio

    image_size = int(query_rgb.shape[0])
    eft_vars = {**models.eft_vars, "params": eft_params}
    latent = models.eft_model.apply(
        eft_vars, context_rgb,
        method=type(models.eft_model).encode)

    def ray_fn(o, d, l):
        return models.eft_model.apply(eft_vars, o, d, l, context_cams,
                                      context_rgb, latent)

    rgb, feat = render_light_field(ray_fn, query_cam, latent_hw, latent_hw,
                                   min_depth, max_depth, n_batches=16)
    eft_img = resize_bilinear(rgb, (image_size, image_size))[0]

    # ancestral sample conditioned on the EFT features
    def denoise(x, log_snr, cond, keep):
        return models.unet_model.apply({"params": unet_params}, x, log_snr,
                                       cond, keep)

    ddpm = models.ddpm
    if sample_timesteps is not None:
        import dataclasses

        ddpm = dataclasses.replace(
            ddpm, config=dataclasses.replace(ddpm.config,
                                             timesteps=sample_timesteps))
    z = ddpm.p_sample_loop(denoise, rng,
                           (1, latent_hw, latent_hw,
                            models.ddpm.config.channels),
                           cond_images=feat)
    sample = np.asarray(models.vae_decode(z))[0]

    cols = [np.asarray(c) for c in context_rgb]
    cols += [np.asarray(query_rgb), np.asarray(eft_img), sample]
    grid = np.hstack(cols)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    imageio.imwrite(out_path, to_uint8(grid))
    return grid
