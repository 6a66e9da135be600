"""Micro-benchmark: candidate backward-scatter formulations for the
blocked grid-encode backward (the round-1 bottleneck — see PERF.md).

The backward of ``blocked_grid_encode`` scatter-adds (N, W) row grads into
the (R, W) blocked table per level.  XLA scatter measured ~45 M rows/s on
v5e (4x slower than gather).  Candidates:

  a. plain jnp .at[].add            (baseline)
  a2. same, bf16 updates            (halved scatter traffic)
  b. sort-by-row + scatter(indices_are_sorted=True, unique=False)
  d. one-hot matmul (chunked over N), bf16 accumulate on MXU

All data enters the jitted fns as *arguments* — closure-captured device
arrays ship as constants in the remote-compile request body (measured:
432 MB -> HTTP 413).

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

    def report(name, fn, extra=()):
        jfn = jax.jit(fn)

        def step(carry):
            i, v, c, *rest = carry
            out = jfn(i, v, c, *rest)
            return (i, v, out, *rest)

        try:
            dt = timeit(step, (idx, vals, jnp.zeros(()), *extra),
                        n1=2, n2=8)
            print(f"{name:36s} {1e3 * dt:9.2f} ms   "
                  f"{N / dt / 1e6:8.1f} Mrows/s", flush=True)
            return dt
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:120]
            print(f"{name:36s} FAILED {type(e).__name__}: {msg}",
                  flush=True)
            return None

    # a. plain scatter-add
    def plain(i, v, c):
        out = jnp.zeros((R, W), jnp.float32)
        out = out.at[i].add(v + c)
        return jnp.sum(out[0]) * 0 + c + 1

    report("a. plain .at[].add", plain)

    # a2. bf16 scatter-add
    def plain_bf16(i, v, c):
        out = jnp.zeros((R, W), jnp.bfloat16)
        out = out.at[i].add((v + c).astype(jnp.bfloat16))
        return jnp.sum(out[0].astype(jnp.float32)) * 0 + c + 1

    report("a2. plain .at[].add bf16", plain_bf16)

    # b. sorted scatter
    def sorted_scatter(i, v, c):
        order = jnp.argsort(i)
        si = i[order]
        sv = v[order] + c
        out = jnp.zeros((R, W), jnp.float32)
        dnums = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1,), inserted_window_dims=(0,),
            scatter_dims_to_operand_dims=(0,))
        out = jax.lax.scatter_add(out, si[:, None], sv, dnums,
                                  indices_are_sorted=True,
                                  unique_indices=False)
        return jnp.sum(out[0]) * 0 + c + 1

    report("b. sort + sorted scatter", sorted_scatter)

    # b2. sort cost alone
    def sort_only(i, v, c):
        order = jnp.argsort(i)
        return jnp.sum(v[order][0]) * 0 + c + 1

    report("b2. sort+permute only", sort_only)

    # d. chunked one-hot matmul
    for chunk in (32768,):
        def onehot_mm(i, v, c, chunk=chunk):
            nchunks = N // chunk
            iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, R), 1)

            def body(acc, j):
                ci = jax.lax.dynamic_slice_in_dim(i, j * chunk, chunk)
                cv = jax.lax.dynamic_slice_in_dim(v, j * chunk, chunk)
                oh = (ci[:, None] == iota).astype(jnp.bfloat16)
                acc = acc + jax.lax.dot_general(
                    oh, (cv + c).astype(jnp.bfloat16),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return acc, 0

            acc = jnp.zeros((R, W), jnp.float32)
            acc, _ = jax.lax.scan(body, acc, jnp.arange(nchunks))
            return jnp.sum(acc[0]) * 0 + c + 1

        report(f"d. one-hot matmul chunk={chunk}", onehot_mm)


if __name__ == "__main__":
    main()
