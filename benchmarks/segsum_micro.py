"""Micro: matmul-based segment reduction vs XLA scatter for the blocked
grid-encode backward, at the REAL per-level shapes (VERDICT r4 item 8).

The blocked backward scatter-adds (N, W) row grads into each level's
(n_rows, W) table slice.  Round-1 micro (scatter_micro.py) measured the
chunked one-hot matmul LOSING at R=32768 (47 ms vs 18 ms scatter) — but
that was the largest level.  The preset's level 0 has only 2460 rows
(reference config: 2460 / 8788 / 27436 for levels 0-2), where the
matmul's N*R*W FLOPs are tiny and the MXU should beat the row-latency
bound scatter.  This micro times, per level size R:

  a. plain .at[].add (the shipped XLA autodiff backward)
  d. chunked one-hot matmul, bf16 operands / f32 accumulate

and one extra whole-step candidate:

  e. ONE fused scatter for all L levels (indices pre-offset into the
     concatenated table) vs L per-level scatters — same row count,
     tests whether XLA pipelines a single scatter better.

Run on the real chip: python benchmarks/segsum_micro.py [N]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.timing import timeit


def segsum_onehot(d_rows, krow, n_rows, chunk):
    """sum_n [krow_n == r] * d_rows[n]  ->  (n_rows, W), chunked over N."""
    N, W = d_rows.shape
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

    acc = jnp.zeros((n_rows, W), jnp.float32)
    acc, _ = jax.lax.scan(body, acc, jnp.arange(nchunks))
    return acc


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 2 ** 21  # ~2.1M points
    W = 108                                                 # preset width

    key = jax.random.PRNGKey(0)
    kv, *kis = jax.random.split(key, 6)
    vals = jax.random.normal(kv, (N, W), dtype=jnp.float32)

    def report(name, fn, args):
        jfn = jax.jit(fn)

        def step(carry):
            c, *rest = carry
            out = jfn(c, *rest)
            return (out, *rest)

        dt = timeit(step, (jnp.zeros(()), *args), n1=2, n2=8)
        print(f"{name:44s} {1e3 * dt:9.2f} ms", flush=True)
        return dt

    # per-level: scatter vs one-hot matmul at the real level sizes
    for R in (2460, 8788, 27436, 32768):
        idx = jax.random.randint(kis[0], (N,), 0, R, dtype=jnp.int32)

        def scat(c, i, v, R=R):
            out = jnp.zeros((R, W), jnp.float32).at[i].add(v + c)
            return jnp.sum(out[0]) * 0 + c + 1

        report(f"a. scatter      R={R}", scat, (idx, vals))

        for chunk in (32768, 131072):
            if N % chunk:
                continue

            def mm(c, i, v, R=R, chunk=chunk):
                out = segsum_onehot(v + c, i, R, chunk)
                return jnp.sum(out[0]) * 0 + c + 1

            report(f"d. onehot-mm    R={R} chunk={chunk}", mm, (idx, vals))

    # e. one fused scatter (all 8 preset levels) vs 8 per-level scatters
    # (smaller N: the fused variant materializes an (8M, W) update tensor)
    M = N // 8
    L = 8
    sizes = [2460] + [32768] * 7
    offs = np.concatenate([[0], np.cumsum(sizes)])
    total = int(offs[-1])
    vals8 = vals[:M]
    idxs = [jax.random.randint(k, (M,), 0, s, dtype=jnp.int32)
            for k, s in zip(jax.random.split(kis[1], L), sizes)]
    idx_all = jnp.concatenate(
        [i + int(o) for i, o in zip(idxs, offs[:-1])])

    def per_level(c, v, *ii):
        acc = jnp.zeros(())
        for l in range(L):
            sl = jnp.zeros((sizes[l], W), jnp.float32).at[ii[l]].add(v + c)
            acc = acc + jnp.sum(sl[0]) * 0
        return acc + c + 1

    def fused(c, v, ia):
        big = jnp.tile(v + c, (L, 1))
        out = jnp.zeros((total, W), jnp.float32).at[ia].add(big)
        return jnp.sum(out[0]) * 0 + c + 1

    report(f"e1. {L} per-level scatters M={M}", per_level, (vals8, *idxs))
    report(f"e2. 1 fused {L}M-row scatter M={M}", fused, (vals8, idx_all))


if __name__ == "__main__":
    main()
