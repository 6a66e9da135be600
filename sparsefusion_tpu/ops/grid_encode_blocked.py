"""Blocked tiled-grid encoding: 1 gather row per (point, level).

TPU gathers are row-count bound (~190M rows/s on v5e regardless of row
width — measured in benchmarks/micro.py), so the naive NGP lookup costs
8 corner rows x L levels per point.  This module reformulates the *tiled*
grid encoding exactly (bit-for-bit same math as ``ops/grid_encode.py``,
same master table parameter) so each (point, level) needs ONE gathered
row:

* The linear tiled index is plain arithmetic: idx(x,y,z) = x + y*sy +
  z*sz (included strides only) taken mod S.  For a block base aligned to
  B (=2) per axis, every corner of every cell in the block lives at
  ``(B*k + delta) mod S`` for a *static* offset set delta in {0..B}^3
  (plain integer arithmetic — exact even at block edges).
* A "blocked table" with 2D rows ``blocked[k, l*C+c] =
  master_flat[((B*k + delta_l) mod S)*C + c]`` therefore materializes
  with a single static-index gather, and one dynamic row fetch per
  (point, level) + a separable trilinear weight contraction reproduces
  the encoding exactly.
* Levels with dropped strides (the reference's capped tiled levels
  ignore those axes) need only (B+1)^2 or (B+1) lanes; rows are padded
  to one common width so ALL levels share a single concatenated table
  and a single gather op (compiles through the remote-compile relay cost
  ~60 s per gather op, so op-count matters as much as row count).

Layout rules learned the hard way (see PERF.md): keep every large
intermediate 2D with the wide dim last — (rows, lanes, C) tables
tile-pad C=2 -> 128 on TPU (64x memory blowup); and never create
multi-MB index constants inside a trace (they inline as HLO literals
and stall the compiler) — indices live on device and enter as buffers.

Only ``gridtype='tiled'`` is supported (SparseFusion's configuration);
hash levels fall back to ``ops/grid_encode.py``.
"""
from __future__ import annotations

import dataclasses
import functools
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
    stride_z: int           # 0 if the z digit is dropped
    n_rows: int             # S // block
    row_offset: int         # row offset in the concatenated blocked table
    lanes: int              # (block+1)^{1,2,3} depending on live axes
    deltas: np.ndarray      # (lanes,) static entry offsets


@dataclasses.dataclass(frozen=True)
class BlockedGridEncoding:
    base: GridEncoding
    levels: Tuple[BlockedLevel, ...]
    block: int
    width: int              # common padded row width (max lanes * C)
    total_rows: int


def make_blocked_encoding(enc: GridEncoding,
                          block: int = 2) -> BlockedGridEncoding:
    """block=2 -> 3^3=27-lane rows (3.4x table duplication);
    block=4 -> 5^3=125-lane rows (1.95x)."""
    assert enc.gridtype == "tiled", "blocked path requires tiled gridtype"
    assert enc.input_dim == 3
    assert block in (2, 4)
    C = enc.level_dim
    nb = block + 1

    raw = []
    max_lanes = 1
    for lvl in range(enc.num_levels):
        S = int(enc.offsets[lvl + 1] - enc.offsets[lvl])
        assert S % block == 0
        R = int(enc.resolutions[lvl])
        sy = int(enc.strides[lvl][1])
        sz = int(enc.strides[lvl][2])
        assert int(enc.strides[lvl][0]) == 1
        if sy != 0 and sz != 0:
            a, b, c = np.meshgrid(np.arange(nb), np.arange(nb),
                                  np.arange(nb), indexing="ij")
            deltas = (a * 1 + b * sy + c * sz).reshape(-1)
        elif sy != 0:
            a, b = np.meshgrid(np.arange(nb), np.arange(nb), indexing="ij")
            deltas = (a * 1 + b * sy).reshape(-1)
        else:
            deltas = np.arange(nb)
        raw.append((S, R, sy, sz, deltas))
        max_lanes = max(max_lanes, len(deltas))

    width = max_lanes * C
    levels = []
    row_offset = 0
    for lvl, (S, R, sy, sz, deltas) in enumerate(raw):
        n_rows = S // block
        levels.append(BlockedLevel(
            size=S, offset=int(enc.offsets[lvl]),
            scale=float(enc.scales[lvl]), resolution=R, stride_y=sy,
            stride_z=sz, n_rows=n_rows, row_offset=row_offset,
            lanes=len(deltas), deltas=deltas.astype(np.int64)))
        row_offset += n_rows

    return BlockedGridEncoding(
        base=enc, levels=tuple(levels), block=block, width=width,
        total_rows=row_offset)


def expand_blocked_tables(master: jnp.ndarray,
                          blk: BlockedGridEncoding) -> jnp.ndarray:
    """Build the (total_rows, width) blocked table gather-free.

    Entry (k, l*C+c) of a level sits at flat-master position
    ``(B*C*k + delta_l*C + c) mod (S*C)`` — for fixed lane l the C
    channels are consecutive, so one roll by ``-delta_l*C`` + a reshape
    to (n_rows, B*C) + a [:, :C] slice materializes the whole (n_rows, C)
    lane block (pure memory moves): no gather op and no index constants.
    (Multi-MB index arrays unavoidably reach XLA as literals — measured
    95MB literals / 7-min remote compiles — and a consolidated 33M-row
    gather OOM'd at 16GB of padded temporaries.)
    """
    C = master.shape[-1]
    flat = master.reshape(-1)
    BC = blk.block * C
    level_mats = []
    for lv in blk.levels:
        fl = jax.lax.dynamic_slice_in_dim(flat, lv.offset * C,
                                          lv.size * C, axis=0)
        # one roll per LANE covers all C channels at once (the channel
        # shifts delta*C + c are consecutive): roll by -delta*C, reshape
        # to (n_rows, B*C), take the first C columns.  4x fewer ops than
        # per-column rolls — op dispatch, not bytes, dominates here (and
        # the autodiff adjoint shrinks identically).
        blocks = []
        for l in range(lv.lanes):
            shift = (int(lv.deltas[l]) * C) % (lv.size * C)
            r = jnp.roll(fl, -shift)
            blocks.append(r.reshape(lv.n_rows, BC)[:, :C])
        if lv.lanes * C < blk.width:
            blocks.append(jnp.zeros(
                (lv.n_rows, blk.width - lv.lanes * C), master.dtype))
        level_mats.append(jnp.concatenate(blocks, axis=1))  # (n_rows, W)
    return jnp.concatenate(level_mats, axis=0)           # (total_rows, W)


def _axis_weights(local: jnp.ndarray, frac: jnp.ndarray,
                  nb: int) -> jnp.ndarray:
    """(N,) local in [0,block), frac in [0,1) -> (N, nb) weights."""
    i = jnp.arange(nb, dtype=local.dtype)[None, :]
    l = local[:, None]
    f = frac[:, None]
    return ((i == l) * (1.0 - f) + (i == l + 1) * f).astype(jnp.float32)


def _level_krow_w(x01: jnp.ndarray, lv: BlockedLevel,
                  blk: BlockedGridEncoding
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-level blocked row index (no row_offset) + padded lane weights.

    x01: (N, 3) f32 in [0, 1] -> krow (N,) i32, w (N, width//C) f32.
    """
    N = x01.shape[0]
    shift = {2: 1, 4: 2}[blk.block]
    mask = blk.block - 1
    nb = blk.block + 1
    max_lanes = blk.width // blk.base.level_dim

    pos = x01 * lv.scale + 0.5
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid
    pg = pos_grid.astype(jnp.int32)
    b = pg >> shift
    local = (pg & mask).astype(jnp.int32)

    krow = b[:, 0].astype(jnp.uint32)
    if lv.stride_y != 0:
        krow = krow + b[:, 1].astype(jnp.uint32) * jnp.uint32(lv.stride_y)
    if lv.stride_z != 0:
        krow = krow + b[:, 2].astype(jnp.uint32) * jnp.uint32(lv.stride_z)
    krow = (krow % jnp.uint32(lv.n_rows)).astype(jnp.int32)

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
    if w.shape[1] < max_lanes:
        w = jnp.pad(w, ((0, 0), (0, max_lanes - w.shape[1])))
    return krow, w


def blocked_grid_encode(x01: jnp.ndarray, table: jnp.ndarray,
                        blk: BlockedGridEncoding,
                        pallas_gather: bool = False,
                        pallas_bin_rows: int = 8192,
                        mm_scatter_rows: int = 0,
                        mm_chunk: int = 131072) -> jnp.ndarray:
    """Encode points with the pre-expanded blocked table.

    Args:
        x01: (N, 3) in [0, 1].
        table: output of :func:`expand_blocked_tables`.
        mm_scatter_rows: if > 0, levels whose blocked table has at most
            this many rows compute their backward table gradient as a
            chunked one-hot MATMUL segment reduction (MXU) instead of
            XLA's scatter-add (row-latency bound, ~45 M rows/s measured
            — PERF.md round 1).  0 disables (the stock autodiff path).
        mm_chunk: N-chunk for the one-hot matmul.

    Returns:
        (N, L * C), identical values to ``grid_encode``.
    """
    if mm_scatter_rows > 0:
        # takes precedence over pallas_gather (the two paths are
        # mutually exclusive; pallas_gather is default-off/dead on the
        # current toolchain anyway — PERF.md round 3c)
        return _blocked_encode_mm(x01, table, blk, mm_scatter_rows,
                                  mm_chunk)
    N = x01.shape[0]
    C = blk.base.level_dim
    L = len(blk.levels)
    W = blk.width
    x01 = x01.astype(jnp.float32)
    oob = jnp.any((x01 < 0.0) | (x01 > 1.0), axis=-1)

    max_lanes = W // C

    level_outs = []
    for lv in blk.levels:
        krow, w = _level_krow_w(x01, lv, blk)

        # per-level gather keeps peak temporaries at (N, W); a consolidated
        # (L*N, W) single gather OOM'd (16 GB padded temps) at render sizes
        if pallas_gather:
            # VMEM-resident gather (kernels/grid_gather.py): the level's
            # table bins fit VMEM at preset sizes; adjoint stays XLA.
            # Interpret mode off-TPU keeps the path CPU-testable.
            from sparsefusion_tpu.kernels.grid_gather import vmem_row_gather

            tbl_l = jax.lax.dynamic_slice_in_dim(
                table, lv.row_offset, lv.n_rows, axis=0)
            rows = vmem_row_gather(
                tbl_l, krow, bin_rows=pallas_bin_rows,
                interpret=jax.default_backend() != "tpu")
        else:
            rows = jnp.take(table, krow + lv.row_offset, axis=0)  # (N, W)
        # contraction over lanes via a (N, lanes, C) reshape (the row
        # layout is lane-major, so the reshape is free) — one fused
        # multiply-reduce instead of repeat + C strided sums, whose
        # adjoints materialized several (N, W) temporaries each
        # (measured ~137 ms of the 641 ms input step)
        rows3 = rows.reshape(N, max_lanes, C)
        out_l = jnp.einsum("nl,nlc->nc", w.astype(table.dtype), rows3,
                           preferred_element_type=jnp.float32)
        level_outs.append(out_l)                          # (N, C)

    out = jnp.stack(level_outs, axis=1).reshape(N, L * C)  # level-major
    return jnp.where(oob[:, None], 0.0, out)


def _segsum_onehot(d_rows: jnp.ndarray, krow: jnp.ndarray, n_rows: int,
                   chunk: int) -> jnp.ndarray:
    """``sum_n [krow_n == r] * d_rows[n] -> (n_rows, W)`` as chunked
    one-hot matmuls: bf16 operands, f32 MXU accumulation.

    The one-hot factor is exact (0/1); the only rounding is d_rows ->
    bf16, and accumulation stays f32 — vs the bf16 scatter-add the
    shipped bf16-table preset uses (which also accumulates IN bf16).
    Out-of-range pad indices (== n_rows) match no column and drop out.
    """
    N, W = d_rows.shape
    if N % chunk:
        pad = chunk - N % chunk
        d_rows = jnp.pad(d_rows, ((0, pad), (0, 0)))
        krow = jnp.pad(krow, (0, pad), constant_values=n_rows)
        N += pad
    nchunks = N // chunk
    iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, n_rows), 1)

    def body(acc, j):
        ci = jax.lax.dynamic_slice_in_dim(krow, j * chunk, chunk)
        cv = jax.lax.dynamic_slice_in_dim(d_rows, j * chunk, chunk)
        oh = (ci[:, None] == iota).astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            oh, cv.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, 0

    if nchunks == 1:
        acc, _ = body(jnp.zeros((n_rows, W), jnp.float32), 0)
        return acc
    acc, _ = jax.lax.scan(body, jnp.zeros((n_rows, W), jnp.float32),
                          jnp.arange(nchunks))
    return acc


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _blocked_encode_mm(x01, table, blk, mm_rows, mm_chunk):
    """blocked_grid_encode with a matmul segment-reduction backward for
    small levels (VERDICT r4 #8: the backward row scatter is latency
    bound at ~45 M rows/s regardless of level size; at n_rows <=
    mm_rows the N*n_rows*W one-hot matmul is cheaper on the MXU)."""
    return blocked_grid_encode(x01, table, blk)


def _blocked_encode_mm_fwd(x01, table, blk, mm_rows, mm_chunk):
    return blocked_grid_encode(x01, table, blk), (x01, table)


def _blocked_encode_mm_bwd(blk, mm_rows, mm_chunk, res, g):
    x01, table = res
    x01f = x01.astype(jnp.float32)
    N = x01f.shape[0]
    C = blk.base.level_dim
    L = len(blk.levels)
    oob = jnp.any((x01f < 0.0) | (x01f > 1.0), axis=-1)
    gm = jnp.where(oob[:, None], 0.0, g)        # adjoint of the oob where
    g3 = gm.reshape(N, L, C)

    d_levels = []
    for li, lv in enumerate(blk.levels):
        krow, w = _level_krow_w(x01f, lv, blk)
        # adjoint of einsum("nl,nlc->nc") wrt the gathered rows
        d_rows = (w[:, :, None] * g3[:, li, :][:, None, :]
                  ).reshape(N, blk.width).astype(jnp.float32)
        if lv.n_rows <= mm_rows:
            d_tab = _segsum_onehot(d_rows, krow, lv.n_rows, mm_chunk)
        else:
            d_tab = jnp.zeros((lv.n_rows, blk.width), jnp.float32
                              ).at[krow].add(d_rows)
        d_levels.append(d_tab)
    d_table = jnp.concatenate(d_levels, axis=0).astype(table.dtype)

    # position cotangent via a nested vjp wrt x01 only: the table is
    # closed over, so NO table scatter appears in this graph; the whole
    # branch is DCE'd when positions are stop-gradiented (they are on
    # every render path — render/volume.py stop-gradients the z samples)
    _, pull = jax.vjp(lambda p: blocked_grid_encode(p, table, blk), x01)
    d_x01 = pull(g)[0]
    return d_x01, d_table


_blocked_encode_mm.defvjp(_blocked_encode_mm_fwd, _blocked_encode_mm_bwd)


def blocked_grid_encode_bound(x: jnp.ndarray, master: jnp.ndarray,
                              blk: BlockedGridEncoding,
                              bound: float = 1.0,
                              tables: jnp.ndarray | None = None,
                              pallas_gather: bool = False,
                              pallas_bin_rows: int = 8192,
                              mm_scatter_rows: int = 0,
                              mm_chunk: int = 131072
                              ) -> jnp.ndarray:
    """[-bound, bound] entry point; expands the table if not given."""
    if tables is None:
        tables = expand_blocked_tables(master, blk)
    prefix = x.shape[:-1]
    x01 = (x.reshape(-1, 3) + bound) / (2.0 * bound)
    out = blocked_grid_encode(x01, tables, blk, pallas_gather=pallas_gather,
                              pallas_bin_rows=pallas_bin_rows,
                              mm_scatter_rows=mm_scatter_rows,
                              mm_chunk=mm_chunk)
    return out.reshape(*prefix, -1)
