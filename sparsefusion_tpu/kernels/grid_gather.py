"""Pallas TPU kernel: VMEM-resident row gather for the blocked NGP encode.

The blocked grid encoding (``ops/grid_encode_blocked.py``) reduces the
NGP lookup to ONE gathered row per (point, level), and at the shipped
preset every level's blocked table is <= 7.1 MB bf16 — small enough to
serve from VMEM instead of HBM, where XLA's gather is latency-bound at
~190 M rows/s (PERF.md).  This kernel gathers rows with Mosaic's
``tpu.dynamic_gather`` (reached through ``jnp.take_along_axis`` inside a
kernel), whose lowering constraint is ``table.shape == idx.shape ==
out.shape`` (jax/_src/pallas/mosaic/lowering.py::_gather_lowering_rule) —
so the table is processed in ``bin_rows``-row bins and points in
``bin_rows``-sized chunks, accumulating the per-bin hit:

    grid = (n_chunks, n_bins)              # bins innermost
    out[chunk] += where(idx in bin, dynamic_gather(table[bin], idx-lo), 0)

The index array must be materialized at (N, 128) — the design's memory
tax; it is int32 (dynamic_gather's index type) and streamed per chunk.

Replaces only the ``jnp.take(table, krow, axis=0)`` row fetch; the
trilinear weight contraction stays in XLA where it fuses.  The backward
(scatter-add of row gradients) keeps XLA's scatter — Mosaic has no
scatter lowering — via ``jax.custom_vjp``, making this a gradient-exact
drop-in.

Equivalent of the reference CUDA gather loop in
``external/gridencoder/src/gridencoder.cu:76-223`` (per-corner fetches
with register accumulation); the TPU form amortizes the 8 corners into
one row (blocked tables) and serves the row from VMEM.

Wired behind ``NGPConfig.pallas_gather`` (the ``pallas_gather=`` kwarg
threaded through ``nn/ngp.py`` -> ``ops/grid_encode_blocked.py``), which
defaults OFF: on this toolchain the Mosaic lowering crashes the remote
TPU compiler at every candidate bin size (round 3c, PERF.md) — the flag
is parity-tested in interpret mode and kept for newer libtpu/Mosaic
stacks.  Falls back to ``jnp.take`` on CPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _gather_kernel(table_ref, idx_ref, out_ref, *, bin_rows: int):
    b = pl.program_id(1)
    lo = b * bin_rows
    idx = idx_ref[:]
    local = idx - lo
    valid = (local >= 0) & (local < bin_rows)
    clamped = jnp.clip(local, 0, bin_rows - 1)
    g = jnp.take_along_axis(table_ref[:], clamped, axis=0)
    hit = jnp.where(valid, g, jnp.zeros_like(g))

    @pl.when(b == 0)
    def _init():
        out_ref[:] = hit

    @pl.when(b > 0)
    def _acc():
        out_ref[:] = out_ref[:] + hit


@functools.partial(jax.jit, static_argnames=("bin_rows", "interpret"))
def _vmem_row_gather_impl(table: jnp.ndarray, krow: jnp.ndarray,
                          bin_rows: int, interpret: bool) -> jnp.ndarray:
    t_rows = table.shape[0]
    n = krow.shape[0]
    n_bins = t_rows // bin_rows
    n_chunks = n // bin_rows
    idx_b = jnp.broadcast_to(krow[:, None].astype(jnp.int32), (n, LANES))

    kernel = functools.partial(_gather_kernel, bin_rows=bin_rows)
    return pl.pallas_call(
        kernel,
        grid=(n_chunks, n_bins),
        in_specs=[
            pl.BlockSpec((bin_rows, LANES), lambda c, b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bin_rows, LANES), lambda c, b: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bin_rows, LANES), lambda c, b: (c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, LANES), table.dtype),
        interpret=interpret,
    )(table, idx_b)


def _pad_rows(x: jnp.ndarray, mult: int) -> jnp.ndarray:
    pad = (-x.shape[0]) % mult
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def vmem_row_gather(table: jnp.ndarray, krow: jnp.ndarray,
                    bin_rows: int = 8192,
                    interpret: bool = False) -> jnp.ndarray:
    """``jnp.take(table, krow, axis=0)`` served from VMEM.

    Args:
        table: (T, W) with W <= 128; padded internally to (T', 128) where
            T' is the next multiple of ``bin_rows``.
        krow: (N,) int32 row ids in [0, T).
        bin_rows: table bin size; bin + idx chunk + out block must fit
            VMEM (8192 -> ~8.5 MB resident at bf16).

    Returns:
        (N, W) gathered rows, same dtype as ``table``.
    """
    out, _ = _gather_fwd(table, krow, bin_rows, interpret)
    return out


def _gather_fwd(table, krow, bin_rows, interpret):
    t_rows, w = table.shape
    n = krow.shape[0]
    tp = _pad_rows(table, bin_rows)
    if w < LANES:
        tp = jnp.pad(tp, ((0, 0), (0, LANES - w)))
    kp = _pad_rows(krow.reshape(-1, 1), bin_rows).reshape(-1)
    out = _vmem_row_gather_impl(tp, kp, bin_rows, interpret)
    return out[:n, :w], (table, krow)


def _gather_bwd(bin_rows, interpret, res, g):
    table, krow = res
    # the gather adjoint is a row scatter-add; Mosaic has no scatter
    # lowering, and XLA's scatter measured faster than every alternative
    # at these shapes (PERF.md round 2: sort+segsum, one-hot matmul)
    gt = jnp.zeros(table.shape, g.dtype).at[krow].add(g)
    return gt.astype(table.dtype), None


vmem_row_gather.defvjp(_gather_fwd, _gather_bwd)
