"""Micro-benchmark: candidate backward-scatter formulations for the
blocked grid-encode backward (the round-1 bottleneck — see PERF.md).

The backward of ``blocked_grid_encode`` scatter-adds (N, W) row grads into
the (R, W) blocked table per level.  XLA scatter measured ~45 M rows/s on
v5e (4x slower than gather).  Candidates:

  a. plain jnp .at[].add            (baseline)
  b. sort-by-row + scatter(indices_are_sorted=True, unique=False)
  c. sort + segment-boundary reduction + unique-row scatter
  d. one-hot matmul (chunked over N), bf16 accumulate on MXU

Run on the real chip: python benchmarks/scatter_micro.py [N] [R] [W]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.timing import timeit


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 56

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, (N,), 0, R, dtype=jnp.int32)
    vals = jax.random.normal(k2, (N, W), dtype=jnp.float32)

    def report(name, fn, carry):
        try:
            dt = timeit(fn, carry, n1=3, n2=9)
            print(f"{name:36s} {1e3 * dt:9.2f} ms   "
                  f"{N / dt / 1e6:8.1f} Mrows/s", flush=True)
            return dt
        except Exception as e:  # noqa: BLE001
            print(f"{name:36s} FAILED {type(e).__name__}: {e}", flush=True)
            return None

    # a. plain scatter-add
    @jax.jit
    def plain(carry):
        out = jnp.zeros((R, W), jnp.float32)
        out = out.at[idx].add(vals + carry)
        return jnp.mean(out)

    report("a. plain .at[].add", plain, jnp.zeros(()))

    # b. sorted scatter
    @jax.jit
    def sorted_scatter(carry):
        order = jnp.argsort(idx)
        si = idx[order]
        sv = vals[order] + carry
        out = jnp.zeros((R, W), jnp.float32)
        dnums = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1,), inserted_window_dims=(0,),
            scatter_dims_to_operand_dims=(0,))
        out = jax.lax.scatter_add(out, si[:, None], sv, dnums,
                                  indices_are_sorted=True,
                                  unique_indices=False)
        return jnp.mean(out)

    report("b. sort + sorted scatter", sorted_scatter, jnp.zeros(()))

    # b2. sort cost alone
    @jax.jit
    def sort_only(carry):
        order = jnp.argsort(idx)
        return jnp.mean(vals[order] + carry)

    report("b2. sort+permute only", sort_only, jnp.zeros(()))

    # c. sort + segmented reduction via associative_scan + unique scatter
    @jax.jit
    def seg_reduce(carry):
        order = jnp.argsort(idx)
        si = idx[order]
        sv = vals[order] + carry
        csum = jnp.cumsum(sv, axis=0)
        is_end = jnp.concatenate([si[1:] != si[:-1],
                                  jnp.ones((1,), bool)])
        # segment sum at each end = csum[end] - csum[prev end]
        ends_csum = jnp.where(is_end[:, None], csum, 0.0)
        prev = jnp.concatenate(
            [jnp.zeros((1, W)), jnp.where(is_end[:-1, None],
                                          csum[:-1], 0.0)])
        # propagate previous end csum forward
        prev_f = jax.lax.associative_scan(
            lambda a, b: jnp.where(jnp.any(b != 0.0, -1, keepdims=True),
                                   b, a), prev, axis=0)
        seg = ends_csum - jnp.where(is_end[:, None], prev_f, 0.0)
        out = jnp.zeros((R, W), jnp.float32)
        out = out.at[si].add(jnp.where(is_end[:, None], seg, 0.0))
        return jnp.mean(out)

    import os
    if os.environ.get("SF_SCATTER_C"):
        report("c. sort + segsum + scatter", seg_reduce, jnp.zeros(()))

    # d. chunked one-hot matmul
    for chunk in (8192, 32768):
        @jax.jit
        def onehot_mm(carry, chunk=chunk):
            nchunks = N // chunk
            iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, R), 1)

            def body(acc, i):
                ci = jax.lax.dynamic_slice_in_dim(idx, i * chunk, chunk)
                cv = jax.lax.dynamic_slice_in_dim(vals, i * chunk, chunk)
                oh = (ci[:, None] == iota).astype(jnp.bfloat16)
                acc = acc + jax.lax.dot_general(
                    oh, (cv + carry).astype(jnp.bfloat16),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return acc, 0

            acc = jnp.zeros((R, W), jnp.float32)
            acc, _ = jax.lax.scan(body, acc, jnp.arange(nchunks))
            return jnp.mean(acc)

        report(f"d. one-hot matmul chunk={chunk}", onehot_mm,
               jnp.zeros(()))


if __name__ == "__main__":
    main()
