"""Multi-resolution hash/tiled grid encoding (instant-NGP) in pure XLA.

TPU-native re-design of the reference CUDA gridencoder
(``external/gridencoder/src/gridencoder.cu:35-223``, python glue
``external/gridencoder/grid.py:91-154``).  Semantics preserved exactly:

* per level l: scale = 2^(l*S) * H - 1, resolution R = ceil(scale) + 1,
* pos = x * scale + 0.5 (align_corners=False), trilinear over 2^D corners,
* index: stride-based linear index over (R+1)^d, a dimension is included
  only while its stride fits the level's table; 'hash' levels whose full
  grid exceeds the table instead xor the corner coords with the NGP primes,
* index = (index mod level_size) + level_offset into one flat [total, C]
  table; out-of-range inputs ([0,1] box) produce zeros,
* output layout [B, L*C], level-major per point.

Where the CUDA kernel needs an atomicAdd scatter for the backward
(``gridencoder.cu:296-311``), here the forward is expressed as jnp.take +
weighted sums and JAX autodiff derives the (deterministic) scatter-add —
no custom VJP needed.  The blocked reformulation in
``sparsefusion_tpu/ops/grid_encode_blocked.py`` accelerates the same
contract on TPU (one gather row per (point, level), 7.6x measured);
this module is the correctness oracle and CPU fallback.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# NGP hashing primes (prime[0]=1 keeps memory coherence for dim 0)
_PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint32)


@dataclasses.dataclass(frozen=True)
class GridEncoding:
    """Static per-level constants for a grid encoding (host-precomputed)."""

    input_dim: int
    num_levels: int
    level_dim: int
    base_resolution: int
    log2_hashmap_size: int
    gridtype: str  # 'hash' | 'tiled'
    per_level_scale: float
    # derived (numpy, static):
    offsets: np.ndarray          # (L+1,) int32 — table offsets per level
    scales: np.ndarray           # (L,) float32 — pos scale per level
    resolutions: np.ndarray      # (L,) int32
    strides: np.ndarray          # (L, D) uint32 — 0 where dim dropped
    use_hash: np.ndarray         # (L,) bool

    @property
    def total_params(self) -> int:
        return int(self.offsets[-1])

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim


def make_grid_encoding(input_dim: int = 3, num_levels: int = 16,
                       level_dim: int = 2, base_resolution: int = 16,
                       log2_hashmap_size: int = 19,
                       desired_resolution: int | None = None,
                       per_level_scale: float = 2.0,
                       gridtype: str = "hash") -> GridEncoding:
    """Build the static encoding config (mirrors ``grid.py:92-124``)."""
    if desired_resolution is not None:
        per_level_scale = float(np.exp2(
            np.log2(desired_resolution / base_resolution) / (num_levels - 1)))

    max_params = 2 ** log2_hashmap_size
    offsets = [0]
    scales = []
    resolutions = []
    strides = []
    use_hash = []
    offset = 0
    for lvl in range(num_levels):
        scale = base_resolution * per_level_scale ** lvl - 1.0
        res = int(np.ceil(scale)) + 1
        params_in_level = min(max_params, (res + 1) ** input_dim)
        params_in_level = int(np.ceil(params_in_level / 8) * 8)
        # stride-based index: include dim d only while stride <= level size
        st = []
        stride = 1
        full_grid_exceeds = False
        for _ in range(input_dim):
            st.append(stride if stride <= params_in_level else 0)
            stride *= res + 1
        full_grid_exceeds = stride > params_in_level
        strides.append(st)
        use_hash.append(gridtype == "hash" and full_grid_exceeds)
        scales.append(scale)
        resolutions.append(res)
        offset += params_in_level
        offsets.append(offset)

    return GridEncoding(
        input_dim=input_dim, num_levels=num_levels, level_dim=level_dim,
        base_resolution=base_resolution, log2_hashmap_size=log2_hashmap_size,
        gridtype=gridtype, per_level_scale=per_level_scale,
        offsets=np.asarray(offsets, np.int64),
        scales=np.asarray(scales, np.float32),
        resolutions=np.asarray(resolutions, np.int32),
        strides=np.asarray(strides, np.uint32),
        use_hash=np.asarray(use_hash, bool),
    )


def init_grid_params(rng: jax.Array, enc: GridEncoding,
                     std: float = 1e-4) -> jnp.ndarray:
    """Uniform(-1e-4, 1e-4) table init (``grid.py:131-133``)."""
    return jax.random.uniform(rng, (enc.total_params, enc.level_dim),
                              minval=-std, maxval=std)


def _corner_bits(d: int) -> np.ndarray:
    """(2^D, D) binary corner offsets."""
    idx = np.arange(2 ** d, dtype=np.uint32)
    return np.stack([(idx >> k) & 1 for k in range(d)], axis=-1)


def grid_encode(x01: jnp.ndarray, table: jnp.ndarray,
                enc: GridEncoding) -> jnp.ndarray:
    """Encode points.

    Args:
        x01: (B, D) points in [0, 1] (caller maps from [-bound, bound]).
        table: (total_params, C) embedding table.

    Returns:
        (B, L * C) encodings, zero where inputs leave the unit box.
    """
    B, D = x01.shape
    L, C = enc.num_levels, enc.level_dim
    x01 = x01.astype(jnp.float32)

    oob = jnp.any((x01 < 0.0) | (x01 > 1.0), axis=-1)  # (B,)

    bits = jnp.asarray(_corner_bits(D))                  # (K, D), K=2^D
    bits_bool = bits.astype(bool)
    primes = jnp.asarray(_PRIMES[:D])
    level_sizes = (enc.offsets[1:] - enc.offsets[:-1]).astype(np.uint32)

    # Static unroll over levels keeps the peak intermediate at (B, K, C)
    # instead of (L, B, K, C) — the difference between fitting a 2M-point
    # render in HBM or not.
    outs = []
    for lvl in range(L):
        pos = x01 * float(enc.scales[lvl]) + 0.5         # (B, D)
        pos_grid = jnp.floor(pos)
        frac = pos - pos_grid
        pos_grid = pos_grid.astype(jnp.uint32)
        corners = pos_grid[:, None, :] + bits[None, :, :]   # (B, K, D)

        w = jnp.where(bits_bool[None], frac[:, None, :],
                      1.0 - frac[:, None, :])
        w = jnp.prod(w, axis=-1)                         # (B, K)

        if bool(enc.use_hash[lvl]):
            index = corners[..., 0] * primes[0]
            for d in range(1, D):
                index = jnp.bitwise_xor(index, corners[..., d] * primes[d])
        else:
            strides = jnp.asarray(enc.strides[lvl])      # (D,) uint32
            index = jnp.sum(corners * strides[None, None, :], axis=-1,
                            dtype=jnp.uint32)

        index = index % jnp.uint32(level_sizes[lvl])
        flat_index = index.astype(jnp.int32) + jnp.int32(enc.offsets[lvl])
        vals = jnp.take(table, flat_index.reshape(-1), axis=0)
        vals = vals.reshape(B, bits.shape[0], C)
        outs.append(jnp.sum(vals * w[..., None].astype(table.dtype), axis=1))

    out = jnp.stack(outs, axis=1)                        # (B, L, C)
    out = jnp.where(oob[:, None, None], 0.0, out)
    # [B, L*C] level-major per point (matches grid.py:52 permute/reshape)
    return out.reshape(B, L * C)


def grid_encode_bound(x: jnp.ndarray, table: jnp.ndarray, enc: GridEncoding,
                      bound: float = 1.0) -> jnp.ndarray:
    """Encode world points in [-bound, bound] (``grid.py:138-150``)."""
    prefix = x.shape[:-1]
    x01 = (x.reshape(-1, enc.input_dim) + bound) / (2.0 * bound)
    out = grid_encode(x01, table, enc)
    return out.reshape(*prefix, enc.output_dim)
