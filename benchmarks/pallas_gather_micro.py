"""Feasibility micro for a VMEM-resident Pallas gather (grid encode).

The blocked NGP encode's hot op is a row gather from per-level tables
that FIT IN VMEM at the shipped preset (<= 7.1 MB bf16 per level, see
ops/grid_encode_blocked.py).  XLA serves it from HBM at ~190 M rows/s
(latency-bound).  Mosaic exposes ``tpu.dynamic_gather`` through
``jnp.take_along_axis(table, idx, axis=0)`` inside a kernel, with a hard
constraint (jax/_src/pallas/mosaic/lowering.py::_gather_lowering_rule):
``table.shape == idx.shape == out.shape`` — the index array must be as
large as the table block, so the design space is (bin rows, idx dtype).

This micro answers, on real hardware:
  1. does the lowering work at (R, 128) for R in {8192, 16384, 32768},
     bf16 table + i32 indices (round 1 crashed at (8192, 128));
  2. what's the in-VMEM gather throughput vs the XLA HBM gather.

Run: python benchmarks/pallas_gather_micro.py [N_points]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from sparsefusion_tpu.utils.runtime import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmarks.timing import timeit


def make_vmem_gather(R, n_chunks, dtype):
    """out[c*R + i] = table[idx[c*R + i]] via one dynamic_gather per chunk."""

    def kernel(table_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(table_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def run(table, idx_b):
        return pl.pallas_call(
            kernel,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((R, 128), lambda c: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 128), lambda c: (c, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, 128), lambda c: (c, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_chunks * R, 128), dtype),
        )(table, idx_b)

    return run


def main():
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    key = jax.random.PRNGKey(0)
    print(f"devices: {jax.devices()}", flush=True)

    for R in (8192, 16384, 32768):
        n_chunks = max(1, n_points // R)
        table = jax.random.normal(key, (R, 128), jnp.float32)
        table_bf = table.astype(jnp.bfloat16)
        idx = jax.random.randint(key, (n_chunks * R,), 0, R, jnp.int32)
        # materialized dense (rows, 128) broadcast (the lowering needs
        # idx.shape == table.shape; this IS the design's memory tax)
        idx_b = jnp.broadcast_to(idx[:, None], (n_chunks * R, 128)) \
            + jnp.zeros((1,), jnp.int32)

        # XLA HBM row-gather baseline at the same row count
        @jax.jit
        def xla_gather(t, i):
            return jnp.take(t, i, axis=0)

        try:
            ref = xla_gather(table_bf, idx)
            dt_x = timeit(
                lambda c: xla_gather(table_bf, idx).sum() + c,
                jnp.zeros(()), n1=5, n2=20)
        except Exception as e:  # noqa: BLE001
            print(f"R={R}: XLA baseline failed: {e}")
            continue

        run = make_vmem_gather(R, n_chunks, jnp.bfloat16)
        try:
            out = run(table_bf, idx_b)
            ok = bool(jnp.allclose(out.astype(jnp.float32),
                                   ref.astype(jnp.float32)))
            dt_p = timeit(lambda c: run(table_bf, idx_b).sum() + c,
                          jnp.zeros(()), n1=5, n2=20)
            rows = n_chunks * R
            print(f"R={R} rows={rows}: pallas {1e3 * dt_p:.2f} ms "
                  f"({rows / dt_p / 1e6:.0f} Mrows/s) vs XLA "
                  f"{1e3 * dt_x:.2f} ms ({rows / dt_x / 1e6:.0f} Mrows/s) "
                  f"correct={ok}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"R={R}: pallas FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
