"""Blocked tiled-grid encoding: 1 gather row per (point, level).

TPU gathers are row-count bound (~190M rows/s on v5e regardless of row
width — measured in benchmarks/micro.py), so the naive NGP lookup costs
8 corner rows x L levels per point.  This module reformulates the *tiled*
grid encoding exactly (bit-for-bit same math as ``ops/grid_encode.py``,
same master table parameter) so each (point, level) needs ONE gathered
row:

* The linear tiled index is plain arithmetic: idx(x,y,z) = x + y*sy +
  z*sz (included strides only) taken mod S.  For a block base aligned to
  B (=2 by default) per axis, every corner of every cell in the block
  lives at ``(B*k + delta) mod S`` for a *static* offset set delta in
  {0..B}^3 (plain integer arithmetic — the identity is exact even at
  block edges).
* Therefore a "blocked table" with 2D rows ``blocked[k, l*C+c] =
  master_flat[((B*k + delta_l) mod S)*C + c]`` materializes with one
  static-index gather per level, and one dynamic row fetch per
  (point, level) + a separable trilinear weight contraction reproduces
  the encoding.  (Keep tables 2D: a (rows, lanes, C) layout tile-pads
  C=2 -> 128 on TPU, a measured 64x memory blowup.)
* Levels with dropped strides (the reference's capped tiled levels
  ignore those axes) use (B+1)^2 or (B+1)^1 lanes.

Row counts per point drop from 8L to L (8x fewer gather rows); the
weight contraction is VPU-friendly elementwise work.  Backward is
autodiff: a row-scatter per (point, level) plus the static-index
scatter transpose of the expand.

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
    n_rows: int             # S // block
    deltas: np.ndarray      # (lanes,) static entry offsets
    lanes: int              # (block+1)^{1,2,3} depending on live axes
    expand_indices: np.ndarray  # (n_rows * lanes * C,) flat master indices


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
    C = enc.level_dim
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
        # static flat-master indices for the one-gather expand:
        # blocked2d[k, l*C + c] = master_flat[(off + (B*k + delta_l) % S)*C + c]
        n_rows = S // block
        ks = np.arange(n_rows, dtype=np.int64)[:, None]
        entry = (block * ks + deltas[None, :]) % S  # (n_rows, lanes)
        flat_idx = ((int(enc.offsets[lvl]) + entry)[:, :, None] * C
                    + np.arange(C)[None, None, :])
        levels.append(BlockedLevel(
            size=S, offset=int(enc.offsets[lvl]), scale=float(enc.scales[lvl]),
            resolution=R, stride_y=sy, stride_z=sz, n_rows=n_rows,
            deltas=deltas.astype(np.int64), lanes=lanes,
            expand_indices=flat_idx.reshape(-1).astype(np.int32)))
    return BlockedGridEncoding(base=enc, levels=tuple(levels),
                               block=block)


# Device-resident copies of the static expand indices.  Creating them
# with jnp.asarray *inside* a traced function would inline them as
# multi-MB HLO literals (pathological for the compiler, especially over
# a remote-compile relay); as pre-placed device arrays they are hoisted
# to jaxpr constvars and passed as plain buffers.
_DEVICE_INDEX_CACHE: dict = {}


def _device_indices(blk: BlockedGridEncoding) -> List[jnp.ndarray]:
    key = id(blk)
    if key not in _DEVICE_INDEX_CACHE:
        # eager even when first touched inside a trace (NGPField.setup
        # can run under jit) — avoids leaking tracers into the cache
        with jax.ensure_compile_time_eval():
            _DEVICE_INDEX_CACHE[key] = [
                jnp.asarray(lv.expand_indices) for lv in blk.levels]
    return _DEVICE_INDEX_CACHE[key]


def expand_blocked_tables(master: jnp.ndarray,
                          blk: BlockedGridEncoding) -> List[jnp.ndarray]:
    """Materialize per-level (n_rows, lanes*C) 2D blocked tables.

    One static-index gather per level from the flattened master.  2D with
    a wide trailing dim matters: (n_rows, lanes, C) tables tile the last
    two dims on TPU, padding C=2 -> 128 lanes (64x memory blowup measured
    as 56 s/expand); the flat layout keeps everything dense.
    """
    C = master.shape[-1]
    flat = master.reshape(-1)
    out = []
    for lv, idx in zip(blk.levels, _device_indices(blk)):
        out.append(jnp.take(flat, idx, axis=0).reshape(
            lv.n_rows, lv.lanes * C))
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
    C = blk.base.level_dim
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

        rows = jnp.take(table, krow, axis=0)     # (N, lanes*C) 2D

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
        # stay 2D: repeat weights per channel, multiply, strided-sum —
        # small trailing dims (lanes, C) would tile-pad 64x on TPU
        w2 = jnp.repeat(w, C, axis=1).astype(table.dtype)  # (N, lanes*C)
        prod = w2 * rows
        outs.append(jnp.stack(
            [jnp.sum(prod[:, c::C], axis=1) for c in range(C)], axis=-1))

    out = jnp.concatenate(outs, axis=1)      # (N, L*C)
    out = jnp.where(oob[:, None], 0.0, out)
    return out


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
