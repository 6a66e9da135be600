"""Occupancy grid: morton coding, density-grid EMA, bitfield, guided sampling.

TPU-native equivalent of the reference's CUDA raymarching extra state
(``raymarching/src/raymarching.cu:214-311``, maintenance
``renderer_df.py:587-641``):

* ``morton3D`` / ``morton3D_invert`` — vectorized uint32 bit interleaving,
* ``update_density_grid`` — sample every cell center (+jitter) per mip
  cascade, EMA-decay update, mean density (the torch loop at
  ``renderer_df.py:595-633`` collapses to one jitted call),
* ``packbits`` — density > thresh packed 8 cells/byte (morton order),
* ``occupancy_lookup`` — per-point bitfield query with the CUDA kernel's
  cascade-selection rule.

Design note: the GPU kernels use the bitfield to *compact* sample points
with atomics (``march_rays_train``) — dynamic shapes and atomics are
hostile to XLA/TPU.  The TPU-idiomatic use is interval tightening +
masking: ``occupancy_near_far`` scans a fixed coarse grid along each ray
and shrinks [near, far] to the occupied span, so the fixed 64+64 sample
budget lands on matter; remaining empty samples are masked to zero
density.  Same semantics (empty space contributes nothing), compiler-
friendly shapes.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Spread bits of a 10-bit int to every 3rd bit (uint32)."""
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3D(coords: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) int coords in [0, 1024) -> (N,) morton codes."""
    x = _expand_bits(coords[..., 0])
    y = _expand_bits(coords[..., 1])
    z = _expand_bits(coords[..., 2])
    return (x | (y << 1) | (z << 2)).astype(jnp.int32)


def _compact_bits(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.uint32) & jnp.uint32(0x49249249)
    x = (x | (x >> 2)) & jnp.uint32(0xC30C30C3)
    x = (x | (x >> 4)) & jnp.uint32(0x0F00F00F)
    x = (x | (x >> 8)) & jnp.uint32(0xFF0000FF)
    x = (x | (x >> 16)) & jnp.uint32(0x0000FFFF)
    return x


def morton3D_invert(indices: jnp.ndarray) -> jnp.ndarray:
    """(N,) morton codes -> (N, 3) coords."""
    i = indices.astype(jnp.uint32)
    return jnp.stack([
        _compact_bits(i >> 0),
        _compact_bits(i >> 1),
        _compact_bits(i >> 2),
    ], axis=-1).astype(jnp.int32)


def packbits(grid: jnp.ndarray, density_thresh: float) -> jnp.ndarray:
    """(C, H^3) densities (morton order) -> (C*H^3//8,) uint8 bitfield."""
    occ = (grid.reshape(-1) > density_thresh).astype(jnp.uint8)
    occ = occ.reshape(-1, 8)
    shifts = jnp.arange(8, dtype=jnp.uint8)
    return jnp.sum(occ << shifts, axis=-1).astype(jnp.uint8)


@dataclasses.dataclass
class OccupancyGrid:
    """Mip-cascaded density grid state (host-managed, device arrays)."""

    bound: float = 4.0
    grid_size: int = 128
    density_thresh: float = 10.0

    def __post_init__(self):
        self.cascade = 1 + int(math.ceil(math.log2(max(self.bound, 1.0))))
        n = self.grid_size ** 3
        self.density_grid = jnp.zeros((self.cascade, n), jnp.float32)
        self.mean_density = 0.0
        self.iter_density = 0
        coords = jnp.stack(jnp.meshgrid(
            jnp.arange(self.grid_size), jnp.arange(self.grid_size),
            jnp.arange(self.grid_size), indexing="ij"), axis=-1).reshape(-1, 3)
        self._morton = morton3D(coords)
        self.bitfield = jnp.zeros((self.cascade * n // 8,), jnp.uint8)

    def update(self, density_fn: Callable, rng: jax.Array,
               decay: float = 0.95):
        """One maintenance step (``renderer_df.py:587-633``)."""
        self.density_grid, self.bitfield, mean = density_grid_update(
            self.density_grid, density_fn, rng, self.bound,
            self.grid_size, self.cascade, self.density_thresh, decay)
        self.mean_density = float(mean)
        self.iter_density += 1
        return self

    # ---------------------------------------------------------------- query
    def occupancy_at(self, x: jnp.ndarray) -> jnp.ndarray:
        return occupancy_lookup(self.bitfield, x, self.bound,
                                self.grid_size, self.cascade)

    def occupancy_near_far(self, rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                           near: jnp.ndarray, far: jnp.ndarray,
                           n_probe: int = 64):
        return occupancy_near_far(self.bitfield, rays_o, rays_d, near, far,
                                  self.bound, self.grid_size, self.cascade,
                                  n_probe)

    def full_bitfield(self) -> jnp.ndarray:
        """All-occupied bitfield (warmup no-op for occupancy-guided paths)."""
        return jnp.full_like(self.bitfield, 255)


def density_grid_update(density_grid: jnp.ndarray, density_fn: Callable,
                        rng: jax.Array, bound: float, grid_size: int,
                        cascade: int, density_thresh: float,
                        decay: float = 0.95):
    """One density-grid maintenance step as a PURE function.

    Same numerics as :meth:`OccupancyGrid.update` (EMA-decay max with
    fresh jittered samples, then packbits at ``min(mean, thresh)``,
    ``renderer_df.py:587-633``) but jit- and vmap-friendly: the
    threshold stays on device, so scene-batched distillation can
    maintain S grids in one program with no host sync per scene.

    Returns ``(new_density_grid, bitfield, mean_density)``.
    """
    gs = grid_size
    coords = morton3D_invert(
        jnp.arange(gs ** 3, dtype=jnp.int32))    # morton-ordered cells
    xyz01 = 2.0 * coords.astype(jnp.float32) / (gs - 1) - 1.0

    new_levels = []
    for cas in range(cascade):
        cas_bound = min(2 ** cas, bound)
        half_cell = cas_bound / gs
        pts = xyz01 * (cas_bound - half_cell)
        rng, k = jax.random.split(rng)
        pts = pts + (jax.random.uniform(k, pts.shape) * 2 - 1) * half_cell
        new_levels.append(density_fn(pts))
    tmp = jnp.stack(new_levels)                  # (C, H^3) morton order

    new_grid = jnp.maximum(density_grid * decay, tmp)
    mean = jnp.mean(new_grid)
    thresh = jnp.minimum(mean, density_thresh)
    return new_grid, packbits(new_grid, thresh), mean


def occupancy_lookup(bitfield: jnp.ndarray, x: jnp.ndarray, bound: float,
                     grid_size: int, cascade: int) -> jnp.ndarray:
    """(N, 3) world points -> (N,) bool occupancy (pure, jit-friendly).

    Cascade selection follows the CUDA marcher: the mip level is the
    smallest cascade whose bound contains the point
    (``raymarching.cu:353-416`` mip logic).
    """
    gs = grid_size
    mx = jnp.max(jnp.abs(x), axis=-1)
    level = jnp.clip(jnp.ceil(jnp.log2(jnp.maximum(mx, 1.0))), 0,
                     cascade - 1).astype(jnp.int32)
    cas_bound = jnp.minimum(2.0 ** level, bound)
    coords = ((x / cas_bound[:, None] + 1.0) * 0.5 * gs).astype(jnp.int32)
    coords = jnp.clip(coords, 0, gs - 1)
    idx = level * (gs ** 3) + morton3D(coords)
    byte = bitfield[idx // 8]
    bit = (byte >> (idx % 8).astype(jnp.uint8)) & 1
    return bit.astype(bool)


def occupancy_near_far(bitfield: jnp.ndarray, rays_o: jnp.ndarray,
                       rays_d: jnp.ndarray, near: jnp.ndarray,
                       far: jnp.ndarray, bound: float, grid_size: int,
                       cascade: int, n_probe: int = 64):
    """Tighten [near, far] to the occupied span along each ray (pure)."""
    t = jnp.linspace(0.0, 1.0, n_probe)
    ts = near[:, None] + (far - near)[:, None] * t[None]  # (N, P)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * ts[..., None]
    occ = occupancy_lookup(bitfield, pts.reshape(-1, 3), bound, grid_size,
                           cascade).reshape(ts.shape)
    any_occ = jnp.any(occ, axis=-1)
    big = jnp.where(occ, ts, jnp.inf)
    small = jnp.where(occ, ts, -jnp.inf)
    dt = (far - near) / (n_probe - 1)
    new_near = jnp.where(any_occ,
                         jnp.clip(jnp.min(big, -1) - dt, near, far), near)
    new_far = jnp.where(any_occ,
                        jnp.clip(jnp.max(small, -1) + dt, near, far), far)
    return new_near, new_far, any_occ
