"""Instant-NGP radiance field (tiled-grid encoder + tiny MLP) in Flax.

Re-design of torch-ngp's ``NeRFNetwork`` as configured by SparseFusion
(``external/nerf/network_grid.py:36-88``, opt in ``distillation.py:500``):
tiledgrid encoder (16 levels x 2ch, 2^16 table, desired resolution
2048*bound), a 3-layer MLP(64) to [sigma_raw, albedo_rgb], density
sigma = trunc_exp(raw + center gaussian blob), sigmoid albedo.

``trunc_exp`` reproduces the reference's clamped-gradient exponential
(``external/ngp_activation.py:10-23``) via jax.custom_vjp.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from sparsefusion_tpu.ops.grid_encode import (
    GridEncoding,
    grid_encode_bound,
    make_grid_encoding,
)
from sparsefusion_tpu.ops.grid_encode_blocked import (
    blocked_grid_encode_bound,
    expand_blocked_tables,
    make_blocked_encoding,
)


@jax.custom_vjp
def trunc_exp(x):
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


def freq_encode(x: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """Classic NeRF frequency encoding: [x, sin/cos(2^i x) ...].

    Equivalent of the reference ``FreqEncoder`` (``external/ngp_encoder.py:
    10-47``); output dim = D * (1 + 2 * degree).
    """
    outs = [x]
    for i in range(degree):
        f = (2.0 ** i) * x
        outs.append(jnp.sin(f))
        outs.append(jnp.cos(f))
    return jnp.concatenate(outs, axis=-1)


def get_encoder(encoding: str, input_dim: int = 3, degree: int = 4,
                **grid_kwargs):
    """Encoder factory (``external/ngp_encoder.py:50-78``).

    Returns (encode_info, output_dim): for grid types an encoding config
    (pair with a table param), for 'frequency' a pure function.
    """
    if encoding == "frequency":
        return (lambda x: freq_encode(x, degree)), input_dim * (1 + 2 * degree)
    if encoding in ("hashgrid", "tiledgrid"):
        gridtype = "hash" if encoding == "hashgrid" else "tiled"
        enc = make_grid_encoding(input_dim=input_dim, gridtype=gridtype,
                                 **grid_kwargs)
        return enc, enc.output_dim
    raise NotImplementedError(
        f"unknown encoding {encoding} (frequency|hashgrid|tiledgrid)")


@dataclasses.dataclass(frozen=True)
class NGPConfig:
    bound: float = 4.0
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 16
    gridtype: str = "tiled"
    num_layers: int = 3
    hidden_dim: int = 64
    density_blob_scale: float = 5.0
    density_blob_std: float = 0.2
    bg_radius: float = 0.0   # > 0 enables the background net
    num_layers_bg: int = 2
    hidden_dim_bg: int = 64
    bg_freq_degree: int = 4
    # blocked lookup: 1 gather row per (point, level) instead of 8 corner
    # rows — 8x fewer gather rows, the TPU bottleneck (identical math;
    # see ops/grid_encode_blocked.py).  Tiled gridtype only.
    use_blocked_lookup: bool = True
    # optional reduced-precision expanded tables (halves gather traffic;
    # the master param stays fp32 for the optimizer). None = fp32.
    table_dtype: Optional[str] = None
    # serve the per-level row gathers from VMEM via the Pallas kernel
    # (kernels/grid_gather.py) instead of XLA's HBM gather.  Default off:
    # on the current toolchain the Mosaic dynamic_gather lowering crashes
    # the TPU compiler at every candidate bin size (PERF.md round 3c);
    # the path is parity-tested in interpret mode and kept for newer
    # libtpu/Mosaic stacks (adjoint scatter stays XLA either way)
    pallas_gather: bool = False
    # levels whose blocked table has <= this many rows compute their
    # backward table gradient as a chunked one-hot MATMUL segment
    # reduction (MXU) instead of XLA's row-latency-bound scatter-add
    # (ops/grid_encode_blocked.py::_segsum_onehot; VERDICT r4 #8).
    # 0 = off (stock autodiff backward).
    mm_scatter_rows: int = 0

    def encoding(self) -> GridEncoding:
        return make_grid_encoding(
            input_dim=3, num_levels=self.num_levels,
            level_dim=self.level_dim, base_resolution=self.base_resolution,
            log2_hashmap_size=self.log2_hashmap_size,
            desired_resolution=int(2048 * self.bound),
            gridtype=self.gridtype)


class NGPField(nn.Module):
    """Density + albedo field over [-bound, bound]^3."""

    config: NGPConfig = NGPConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self._enc = cfg.encoding()
        self._blocked = None
        if cfg.use_blocked_lookup and cfg.gridtype == "tiled":
            self._blocked = make_blocked_encoding(self._enc)
        self.grid = self.param(
            "grid",
            lambda key: jax.random.uniform(
                key, (self._enc.total_params, cfg.level_dim),
                minval=-1e-4, maxval=1e-4))
        self.mlp = [
            nn.Dense(cfg.hidden_dim if i < cfg.num_layers - 1 else 4,
                     dtype=self.dtype, name=f"sigma_net_{i}")
            for i in range(cfg.num_layers)
        ]
        if cfg.bg_radius > 0:
            self.bg_net = [
                nn.Dense(cfg.hidden_dim_bg
                         if i < cfg.num_layers_bg - 1 else 3,
                         dtype=self.dtype, name=f"bg_net_{i}")
                for i in range(cfg.num_layers_bg)
            ]

    def density_blob(self, x):
        """Center gaussian prior on sigma (``network_grid.py:69-75``)."""
        cfg = self.config
        d = jnp.sum(x ** 2, axis=-1)
        return cfg.density_blob_scale * jnp.exp(
            -d / (2 * cfg.density_blob_std ** 2))

    def expand_tables(self):
        """Pre-expand blocked tables once per train step (cheap: rolls +
        strided slices); pass the result to __call__ via ``tables=``."""
        if self._blocked is None:
            return None
        tables = expand_blocked_tables(self.grid, self._blocked)
        if self.config.table_dtype is not None:
            tables = tables.astype(self.config.table_dtype)
        return tables

    def __call__(self, x: jnp.ndarray, tables=None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (..., 3) in [-bound, bound] -> (sigma (...,), albedo (..., 3))."""
        cfg = self.config
        if self._blocked is not None:
            h = blocked_grid_encode_bound(x, self.grid, self._blocked,
                                          bound=cfg.bound, tables=tables,
                                          pallas_gather=cfg.pallas_gather,
                                          mm_scatter_rows=cfg.mm_scatter_rows)
        else:
            h = grid_encode_bound(x, self.grid, self._enc, bound=cfg.bound)
        h = h.astype(self.dtype)
        for i, layer in enumerate(self.mlp):
            h = layer(h)
            if i < cfg.num_layers - 1:
                h = jax.nn.relu(h)
        h = h.astype(jnp.float32)
        sigma = trunc_exp(h[..., 0] + self.density_blob(x))
        albedo = jax.nn.sigmoid(h[..., 1:])
        return sigma, albedo

    def density(self, x):
        sigma, albedo = self(x)
        return {"sigma": sigma, "albedo": albedo}

    def init_all(self, x: jnp.ndarray) -> None:
        """Init helper touching every submodule (incl. the bg net)."""
        self(x)
        if self.config.bg_radius > 0:
            self.background(x)

    def background(self, d: jnp.ndarray) -> jnp.ndarray:
        """View-direction background color (``network_grid.py:211-220``)."""
        cfg = self.config
        assert cfg.bg_radius > 0, "background net disabled (bg_radius=0)"
        h = freq_encode(d, cfg.bg_freq_degree).astype(self.dtype)
        for i, layer in enumerate(self.bg_net):
            h = layer(h)
            if i < cfg.num_layers_bg - 1:
                h = jax.nn.relu(h)
        return jax.nn.sigmoid(h.astype(jnp.float32))
