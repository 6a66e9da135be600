"""Procedural multi-view scene for tests/demos without CO3D on disk.

Generates an orbit of cameras around a cluster of colored density blobs
and renders ground-truth images with the framework's own volume renderer
— giving geometrically consistent multi-view data that exercises the full
pipeline (EFT conditioning, distillation, metrics) end-to-end on any
machine.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from sparsefusion_tpu.core.cameras import Cameras, look_at_view_transform
from sparsefusion_tpu.core.rays import grid_ray_bundle
from sparsefusion_tpu.data.contract import SceneData
from sparsefusion_tpu.render.volume import VolumeRendererConfig, render_rays


def blob_field(centers: np.ndarray, colors: np.ndarray, sigma: float = 60.0,
               radius: float = 0.45):
    """Gaussian density blobs with per-blob albedo."""
    centers_j = jnp.asarray(centers, jnp.float32)
    colors_j = jnp.asarray(colors, jnp.float32)

    def field(x):
        d2 = jnp.sum((x[:, None, :] - centers_j[None]) ** 2, axis=-1)
        dens = sigma * jnp.exp(-d2 / (2 * radius ** 2))  # (P, K)
        total = jnp.sum(dens, axis=-1)
        w = dens / jnp.maximum(total[:, None], 1e-8)
        rgb = jnp.einsum("pk,kc->pc", w, colors_j)
        return total, rgb

    return field


def orbit_cameras(n_views: int, radius: float = 3.0, height: float = 0.8,
                  focal: float = 3.0, image_size: int = 64,
                  seed: int = 0) -> Cameras:
    rng = np.random.RandomState(seed)
    t = np.linspace(0, 2 * math.pi, n_views, endpoint=False)
    t = t + rng.uniform(-0.05, 0.05, n_views)
    h = height + rng.uniform(-0.15, 0.15, n_views)
    eye = np.stack([radius * np.cos(t), h, radius * np.sin(t)],
                   axis=1).astype(np.float32)
    at = np.zeros((1, 3), np.float32)
    up = np.array([[0.0, 1.0, 0.0]], np.float32)
    R, T = look_at_view_transform(eye, at, up)
    n = n_views
    return Cameras.create(R, T, np.full((n, 2), focal, np.float32),
                          np.zeros((n, 2), np.float32),
                          np.full((n, 2), float(image_size), np.float32))


def make_synthetic_scene(n_views: int = 10, image_size: int = 64,
                         n_blobs: int = 4, seed: int = 0,
                         bound: float = 4.0) -> SceneData:
    rng = np.random.RandomState(seed)
    centers = rng.uniform(-0.7, 0.7, (n_blobs, 3)).astype(np.float32)
    colors = rng.uniform(0.2, 1.0, (n_blobs, 3)).astype(np.float32)

    cams = orbit_cameras(n_views, image_size=image_size, seed=seed)
    cfg = VolumeRendererConfig(num_steps=96, upsample_steps=0, bound=bound,
                               min_near=0.1)

    # Pin the fixture render to the host CPU backend: it's test/demo data
    # generation, and routing its eager ray-bundle ops + render through a
    # remote accelerator adds minutes of relay round-trips (and a relay
    # outage can hang it entirely)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        field = blob_field(centers, colors)
        bundle = grid_ray_bundle(cams, image_size, image_size,
                                 n_pts_per_ray=2, min_depth=1.0,
                                 max_depth=5.0)
        rays_o = np.asarray(bundle.origins).reshape(-1, 3)
        rays_d = np.asarray(bundle.directions).reshape(-1, 3)

        out = jax.jit(lambda o, d: render_rays(field, o, d, cfg,
                                               det_importance=True,
                                               bg_color=0.0))(
            jnp.asarray(rays_o), jnp.asarray(rays_d))
        images = np.asarray(out["image"]).reshape(
            n_views, image_size, image_size, 3).astype(np.float32)
        masks = np.asarray(out["weights_sum"]).reshape(
            n_views, image_size, image_size, 1).astype(np.float32)

    n = n_views
    return SceneData(
        images=np.clip(images, 0, 1),
        R=np.asarray(cams.R), T=np.asarray(cams.T),
        f=np.asarray(cams.focal_length), c=np.asarray(cams.principal_point),
        valid_region=np.ones((n, image_size, image_size, 1), np.float32),
        image_size=np.asarray(cams.image_size),
        masks=np.clip(masks, 0, 1),
        sequence_name=f"synthetic_{seed:03d}",
    )


class SyntheticDataset:
    """Dataset-shaped wrapper: index -> SceneData (new blob layout each)."""

    def __init__(self, n_scenes: int = 4, n_views: int = 10,
                 image_size: int = 64):
        self.n_scenes = n_scenes
        self.n_views = n_views
        self.image_size = image_size
        # synthesis renders through the volume renderer — cache scenes
        # so a training loop re-drawing the same ids each step doesn't
        # re-render them (4 scenes at 256^2 x 10 views = ~31 MB host)
        self._cache = {}

    def __len__(self):
        return self.n_scenes

    def __getitem__(self, idx: int) -> SceneData:
        if idx not in self._cache:
            self._cache[idx] = make_synthetic_scene(
                self.n_views, self.image_size, seed=idx)
        return self._cache[idx]
