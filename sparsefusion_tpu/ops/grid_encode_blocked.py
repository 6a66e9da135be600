"""Blocked tiled-grid encoding: 1 gather row per (point, level).

TPU gathers are row-count bound (~190M rows/s on v5e regardless of row
width — measured in benchmarks/micro.py), so the naive NGP lookup costs
8 corner rows x L levels per point.  This module reformulates the *tiled*
grid encoding exactly (bit-for-bit same math as ``ops/grid_encode.py``,
same master table parameter) so each (point, level) needs ONE gathered
row:

* The linear tiled index is plain arithmetic: idx(x,y,z) = x + y*sy +
  z*sz (included strides only) taken mod S.  For a block base aligned to
  4 per axis, every corner of every cell in the block lives at
  ``(4*k + delta) mod S`` for a *static* offset set delta in
  {0..4}x{0..4}x{0..4} (digit arithmetic never carries — it's plain
  integer arithmetic, so the identity is exact even at block edges).
* Therefore a "blocked table" with rows ``blocked[k, d] =
  master[(4*k + delta_d) mod S]`` (k in [0, S/4)) can be materialized
  from the master by 125 rolls + stride-4 slices — pure memory moves, no
  gather — and one dynamic row fetch per (point, level) plus a separable
  125-lane trilinear weight contraction reproduces the encoding.
* Levels whose z-stride exceeds the table (the reference's capped tiled
  levels ignore z entirely) use 5x5 = 25-lane 2D rows.

Row counts per point drop from 8L to L (16x fewer gather rows); the
weight contraction is VPU-friendly elementwise work.  Backward is
autodiff: a row-scatter per (point, level) plus the structured transpose
of the roll/slice expansion.

Only ``gridtype='tiled'`` is supported (SparseFusion's configuration);
hash levels fall back to ``ops/grid_encode.py``.
"""
from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sparsefusion_tpu.ops.grid_encode import GridEncoding


@dataclasses.dataclass(frozen=True)
class BlockedLevel:
    size: int               # S (table entries in this level)
    offset: int             # master-table offset
    scale: float
    resolution: int
    stride_y: int
    stride_z: int           # 0 if the z digit is dropped (2D level)
    n_rows: int             # S // 4
    deltas: np.ndarray      # (lanes,) static entry offsets
    lanes: int              # 125 (3D) or 25 (2D)


@dataclasses.dataclass(frozen=True)
class BlockedGridEncoding:
    base: GridEncoding
    levels: Tuple[BlockedLevel, ...]
    block: int = 2


def make_blocked_encoding(enc: GridEncoding,
                          block: int = 2) -> BlockedGridEncoding:
    """block=2 -> 3^3=27-lane rows (less memory traffic, 3.4x table
    duplication); block=4 -> 5^3=125-lane rows (1.95x duplication)."""
    assert enc.gridtype == "tiled", "blocked path requires tiled gridtype"
    assert enc.input_dim == 3
    assert block in (2, 4)
    nb = block + 1
    levels = []
    for lvl in range(enc.num_levels):
        S = int(enc.offsets[lvl + 1] - enc.offsets[lvl])
        assert S % block == 0
        R = int(enc.resolutions[lvl])
        sy = int(enc.strides[lvl][1])
        sz = int(enc.strides[lvl][2])
        assert int(enc.strides[lvl][0]) == 1
        # dropped strides (stride > table size) mean the level's lookup
        # ignores that axis entirely — fewer delta lanes needed
        if sy != 0 and sz != 0:
            a, b, c = np.meshgrid(np.arange(nb), np.arange(nb),
                                  np.arange(nb), indexing="ij")
            deltas = (a * 1 + b * sy + c * sz).reshape(-1)
            lanes = nb ** 3
        elif sy != 0:
            a, b = np.meshgrid(np.arange(nb), np.arange(nb), indexing="ij")
            deltas = (a * 1 + b * sy).reshape(-1)
            lanes = nb ** 2
        else:
            deltas = np.arange(nb)
            lanes = nb
        levels.append(BlockedLevel(
            size=S, offset=int(enc.offsets[lvl]), scale=float(enc.scales[lvl]),
            resolution=R, stride_y=sy, stride_z=sz, n_rows=S // block,
            deltas=deltas.astype(np.int64), lanes=lanes))
    return BlockedGridEncoding(base=enc, levels=tuple(levels),
                               block=block)


def expand_blocked_tables(master: jnp.ndarray,
                          blk: BlockedGridEncoding) -> List[jnp.ndarray]:
    """Materialize per-level (n_rows, lanes, C) blocked tables.

    Pure rolls + stride-4 slices of the master — no gathers; XLA compiles
    this to memory moves, and its transpose (the backward) to structured
    adds.
    """
    C = master.shape[-1]
    out = []
    for lv in blk.levels:
        m = jax.lax.dynamic_slice_in_dim(master, lv.offset, lv.size, axis=0)
        cols = []
        for d in lv.deltas:
            shifted = jnp.roll(m, -int(d % lv.size), axis=0)
            cols.append(shifted[::blk.block])   # (n_rows, C)
        out.append(jnp.stack(cols, axis=1))     # (n_rows, lanes, C)
    return out


def _axis_weights(local: jnp.ndarray, frac: jnp.ndarray,
                  nb: int) -> jnp.ndarray:
    """(N,) local in [0,block), frac in [0,1) -> (N, nb) weights:
    weight local -> (1-frac), local+1 -> frac."""
    i = jnp.arange(nb, dtype=local.dtype)[None, :]
    l = local[:, None]
    f = frac[:, None]
    return ((i == l) * (1.0 - f) + (i == l + 1) * f).astype(jnp.float32)


def blocked_grid_encode(x01: jnp.ndarray, tables: List[jnp.ndarray],
                        blk: BlockedGridEncoding) -> jnp.ndarray:
    """Encode points with pre-expanded blocked tables.

    Args:
        x01: (N, 3) in [0, 1].
        tables: output of :func:`expand_blocked_tables`.

    Returns:
        (N, L * C), identical values to ``grid_encode``.
    """
    N = x01.shape[0]
    C = tables[0].shape[-1]
    x01 = x01.astype(jnp.float32)
    oob = jnp.any((x01 < 0.0) | (x01 > 1.0), axis=-1)

    shift = {2: 1, 4: 2}[blk.block]
    mask = blk.block - 1
    nb = blk.block + 1
    outs = []
    for lv, table in zip(blk.levels, tables):
        pos = x01 * lv.scale + 0.5
        pos_grid = jnp.floor(pos)
        frac = pos - pos_grid
        pg = pos_grid.astype(jnp.int32)
        b = pg >> shift                      # block coords (N, 3)
        local = (pg & mask).astype(jnp.int32)

        krow = b[:, 0].astype(jnp.uint32)
        if lv.stride_y != 0:
            krow = krow + b[:, 1].astype(jnp.uint32) * jnp.uint32(lv.stride_y)
        if lv.stride_z != 0:
            krow = krow + b[:, 2].astype(jnp.uint32) * jnp.uint32(lv.stride_z)
        krow = (krow % jnp.uint32(lv.n_rows)).astype(jnp.int32)

        rows = jnp.take(table, krow, axis=0)     # (N, lanes, C)

        # dropped-axis weights sum to 1, so omitting them is exact
        wx = _axis_weights(local[:, 0], frac[:, 0], nb)
        if lv.stride_y != 0 and lv.stride_z != 0:
            wy = _axis_weights(local[:, 1], frac[:, 1], nb)
            wz = _axis_weights(local[:, 2], frac[:, 2], nb)
            w = jnp.einsum("na,nb,nc->nabc", wx, wy, wz).reshape(N, nb ** 3)
        elif lv.stride_y != 0:
            wy = _axis_weights(local[:, 1], frac[:, 1], nb)
            w = jnp.einsum("na,nb->nab", wx, wy).reshape(N, nb ** 2)
        else:
            w = wx
        # elementwise multiply + reduce (VPU) — fuses into the gather
        # consumer better than a dot_general lowering
        outs.append(jnp.sum(w[..., None].astype(table.dtype) * rows, axis=1))

    out = jnp.stack(outs, axis=1)            # (N, L, C)
    out = jnp.where(oob[:, None, None], 0.0, out)
    return out.reshape(N, len(blk.levels) * C)


def blocked_grid_encode_bound(x: jnp.ndarray, master: jnp.ndarray,
                              blk: BlockedGridEncoding,
                              bound: float = 1.0,
                              tables: List[jnp.ndarray] | None = None
                              ) -> jnp.ndarray:
    """[-bound, bound] entry point; expands tables if not given."""
    if tables is None:
        tables = expand_blocked_tables(master, blk)
    prefix = x.shape[:-1]
    x01 = (x.reshape(-1, 3) + bound) / (2.0 * bound)
    out = blocked_grid_encode(x01, tables, blk)
    return out.reshape(*prefix, -1)
