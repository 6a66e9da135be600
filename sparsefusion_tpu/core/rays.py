"""Ray bundle construction matching PyTorch3D's Grid/MonteCarlo raysamplers.

The reference builds all rays through PyTorch3D ``GridRaysampler`` /
``MonteCarloRaysampler`` with *reversed* NDC bounds
(min_x = 1 - 1/W, max_x = -1 + 1/W; ``utils/render_utils.py:43-92``) and
``_xy_to_ray_bundle`` semantics: unproject each xy at depths 1 and 2,
direction = p2 - p1 (unnormalized, unit z in view space), origin =
p1 - direction (the camera center), lengths = linspace(min_depth,
max_depth) interpreted as view-space z-depths.

Everything is shape-static: a grid sampler for (H, W) always yields
(N, H, W, n_pts) bundles, jit/vmap-friendly.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from sparsefusion_tpu.core.cameras import Cameras, unproject_ndc_points


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RayBundle:
    """origins (..., 3), directions (..., 3), lengths (..., P), xys (..., 2)."""

    origins: jnp.ndarray
    directions: jnp.ndarray
    lengths: jnp.ndarray
    xys: Optional[jnp.ndarray]


def ray_points(bundle: RayBundle) -> jnp.ndarray:
    """World points along rays: o + d * t. (..., P, 3).

    Equivalent of pytorch3d ``ray_bundle_to_ray_points`` used at
    ``sparsefusion/eft.py:379``.
    """
    return (bundle.origins[..., None, :]
            + bundle.directions[..., None, :] * bundle.lengths[..., :, None])


def xy_to_ray_bundle(cameras: Cameras, xy_grid: jnp.ndarray, min_depth: float,
                     max_depth: float, n_pts_per_ray: int) -> RayBundle:
    """Replicates pytorch3d ``_xy_to_ray_bundle`` (raysampling.py).

    Args:
        xy_grid: (N, ..., 2) NDC xy locations per camera.

    Returns:
        RayBundle with fields shaped (N, ..., 3 / n_pts / 2).
    """
    n = xy_grid.shape[0]
    spatial = xy_grid.shape[1:-1]
    xy_flat = xy_grid.reshape(n, -1, 2)
    p = xy_flat.shape[1]

    depths = jnp.linspace(min_depth, max_depth, n_pts_per_ray,
                          dtype=xy_grid.dtype)
    lengths = jnp.broadcast_to(depths, (n, p, n_pts_per_ray))

    # unproject the same xys at depths 1 and 2
    ones = jnp.ones((n, p, 1), xy_grid.dtype)
    plane1 = unproject_ndc_points(
        cameras, jnp.concatenate([xy_flat, ones], axis=-1))
    plane2 = unproject_ndc_points(
        cameras, jnp.concatenate([xy_flat, 2.0 * ones], axis=-1))
    directions = plane2 - plane1
    origins = plane1 - directions

    return RayBundle(
        origins=origins.reshape(n, *spatial, 3),
        directions=directions.reshape(n, *spatial, 3),
        lengths=lengths.reshape(n, *spatial, n_pts_per_ray),
        xys=xy_grid,
    )


def grid_xys(image_height: int, image_width: int, min_x: float, max_x: float,
             min_y: float, max_y: float, dtype=jnp.float32) -> jnp.ndarray:
    """The (H, W, 2) NDC xy grid a GridRaysampler iterates over."""
    xs = jnp.linspace(min_x, max_x, image_width, dtype=dtype)
    ys = jnp.linspace(min_y, max_y, image_height, dtype=dtype)
    x_grid = jnp.broadcast_to(xs[None, :], (image_height, image_width))
    y_grid = jnp.broadcast_to(ys[:, None], (image_height, image_width))
    return jnp.stack([x_grid, y_grid], axis=-1)


@dataclasses.dataclass(frozen=True)
class GridRaysampler:
    """Fixed-shape grid ray sampler (pytorch3d GridRaysampler semantics)."""

    min_x: float
    max_x: float
    min_y: float
    max_y: float
    image_height: int
    image_width: int
    n_pts_per_ray: int
    min_depth: float
    max_depth: float

    def __call__(self, cameras: Cameras) -> RayBundle:
        xy = grid_xys(self.image_height, self.image_width, self.min_x,
                      self.max_x, self.min_y, self.max_y)
        xy = jnp.broadcast_to(xy[None], (len(cameras), *xy.shape))
        return xy_to_ray_bundle(cameras, xy, self.min_depth, self.max_depth,
                                self.n_pts_per_ray)


@dataclasses.dataclass(frozen=True)
class MonteCarloRaysampler:
    """Uniform-random xy sampler (pytorch3d MonteCarloRaysampler semantics)."""

    min_x: float
    max_x: float
    min_y: float
    max_y: float
    n_rays_per_image: int
    n_pts_per_ray: int
    min_depth: float
    max_depth: float

    def __call__(self, cameras: Cameras, rng: jax.Array) -> RayBundle:
        n = len(cameras)
        kx, ky = jax.random.split(rng)
        xs = jax.random.uniform(
            kx, (n, self.n_rays_per_image), minval=min(self.min_x, self.max_x),
            maxval=max(self.min_x, self.max_x))
        ys = jax.random.uniform(
            ky, (n, self.n_rays_per_image), minval=min(self.min_y, self.max_y),
            maxval=max(self.min_y, self.max_y))
        xy = jnp.stack([xs, ys], axis=-1)
        return xy_to_ray_bundle(cameras, xy, self.min_depth, self.max_depth,
                                self.n_pts_per_ray)


def grid_ray_bundle(cameras: Cameras, image_height: int, image_width: int,
                    n_pts_per_ray: int, min_depth: float,
                    max_depth: float) -> RayBundle:
    """Grid rays with the reference's reversed half-pixel bounds.

    Matches ``init_ray_sampler`` / ``init_light_field_renderer`` grid
    samplers (``utils/render_utils.py:43-53``).
    """
    half_w = 1.0 / image_width
    half_h = 1.0 / image_height
    sampler = GridRaysampler(
        min_x=1.0 - half_w, max_x=-1.0 + half_w,
        min_y=1.0 - half_h, max_y=-1.0 + half_h,
        image_height=image_height, image_width=image_width,
        n_pts_per_ray=n_pts_per_ray, min_depth=min_depth, max_depth=max_depth)
    return sampler(cameras)


def monte_carlo_ray_bundle(cameras: Cameras, rng: jax.Array, n_rays: int,
                           n_pts_per_ray: int, min_depth: float,
                           max_depth: float, bbox=None) -> RayBundle:
    """MC rays over the full NDC square or a bbox (``render_utils.py:66-87``)."""
    if bbox is None:
        bounds = dict(min_x=-1.0, max_x=1.0, min_y=-1.0, max_y=1.0)
    else:
        bounds = dict(min_x=-bbox[0][1], max_x=-bbox[0][3],
                      min_y=-bbox[0][0], max_y=-bbox[0][2])
    sampler = MonteCarloRaysampler(
        n_rays_per_image=n_rays, n_pts_per_ray=n_pts_per_ray,
        min_depth=min_depth, max_depth=max_depth, **bounds)
    return sampler(cameras, rng)
