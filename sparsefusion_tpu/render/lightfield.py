"""Light-field rendering: EFT over a camera's ray grid.

Replaces ``CustomImplicitRenderer`` + ``LightFieldRaymarcher``
(``utils/eft_renderer.py:18-140``, ``utils/eft_raymarcher.py:16-33``): a
grid ray sampler feeds the EFT in fixed-size chunks; the "raymarcher" is
just the concatenation of the per-ray rgb (3) and feature (256) outputs,
returned as images.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp

from sparsefusion_tpu.core.cameras import Cameras
from sparsefusion_tpu.core.rays import grid_ray_bundle
from sparsefusion_tpu.nn.eft import batched_forward


def render_light_field(
    eft_apply: Callable,
    cameras: Cameras,
    image_height: int,
    image_width: int,
    min_depth: float,
    max_depth: float,
    n_pts_per_ray: int = 20,
    n_batches: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render EFT rgb + feature images for each camera.

    Args:
        eft_apply: (origins (n,3), dirs (n,3), lengths (n,D)) -> (rgb, feat)
            — the EFT bound to context views (see ``nn/eft.py``).
        cameras: query cameras (usually 1 at a time, relative frame).

    Returns:
        rgb (N, H, W, 3), features (N, H, W, F).
    """
    bundle = grid_ray_bundle(cameras, image_height, image_width,
                             n_pts_per_ray, min_depth, max_depth)
    rgb, feat = batched_forward(
        eft_apply, bundle.origins, bundle.directions, bundle.lengths,
        n_batches=n_batches)
    return rgb, feat
