"""Parity of the matmul segment-reduction backward (mm_scatter_rows)
against the stock XLA-autodiff blocked path.

The mm path (ops/grid_encode_blocked.py::_blocked_encode_mm) only
changes HOW the table cotangent is reduced (chunked bf16 one-hot matmul
with f32 accumulation vs scatter-add); the forward is the identical
program, and the position cotangent is a nested vjp of the same ops, so
those two must match exactly.  Table grads match to bf16 rounding of
the per-row updates.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsefusion_tpu.ops.grid_encode import make_grid_encoding
from sparsefusion_tpu.ops.grid_encode_blocked import (
    blocked_grid_encode_bound,
    make_blocked_encoding,
)


@pytest.fixture(scope="module")
def setup():
    enc = make_grid_encoding(
        input_dim=3, num_levels=4, level_dim=2, base_resolution=16,
        log2_hashmap_size=13, desired_resolution=64, gridtype="tiled")
    blk = make_blocked_encoding(enc)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    master = jax.random.normal(k1, (enc.total_params, enc.level_dim),
                               dtype=jnp.float32) * 0.1
    # include out-of-bound points (the oob mask is part of the adjoint)
    x = jax.random.uniform(k2, (257, 3), minval=-1.3, maxval=1.3)
    return enc, blk, master, x


def _loss(master, x, blk, mm_rows, mm_chunk=64):
    out = blocked_grid_encode_bound(
        x, master, blk, bound=1.0, mm_scatter_rows=mm_rows,
        mm_chunk=mm_chunk)
    # non-uniform weighting so per-row grads differ
    w = jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape) % 7
    return jnp.sum(out * w)


def test_forward_identical(setup):
    enc, blk, master, x = setup
    a = blocked_grid_encode_bound(x, master, blk, mm_scatter_rows=0)
    b = blocked_grid_encode_bound(x, master, blk,
                                  mm_scatter_rows=10 ** 9, mm_chunk=64)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("mm_rows_key", ["all", "mixed"])
def test_master_grad_close(setup, mm_rows_key):
    enc, blk, master, x = setup
    sizes = sorted(lv.n_rows for lv in blk.levels)
    mm_rows = 10 ** 9 if mm_rows_key == "all" else sizes[0]
    if mm_rows_key == "mixed":
        assert any(lv.n_rows <= mm_rows for lv in blk.levels)
        assert any(lv.n_rows > mm_rows for lv in blk.levels)
    g_ref = jax.grad(_loss)(master, x, blk, 0)
    g_mm = jax.grad(_loss)(master, x, blk, mm_rows)
    ref = np.asarray(g_ref)
    mm = np.asarray(g_mm)
    scale = np.abs(ref).max()
    # bf16 rounding of the (N, W) row updates before f32 accumulation
    np.testing.assert_allclose(mm, ref, atol=1.2e-2 * scale)
    # the scatter-handled levels (mixed case) must be EXACT
    if mm_rows_key == "mixed":
        # level rows in the master are [offset, offset+size); exact where
        # the level used the scatter path
        for lv in blk.levels:
            if lv.n_rows > mm_rows:
                sl = slice(lv.offset, lv.offset + lv.size)
                np.testing.assert_array_equal(mm[sl], ref[sl])


def test_position_grad_identical(setup):
    enc, blk, master, x = setup

    def loss_x(xv, mm_rows):
        return _loss(master, xv, blk, mm_rows)

    g_ref = jax.grad(loss_x)(x, 0)
    g_mm = jax.grad(loss_x)(x, 10 ** 9)
    np.testing.assert_allclose(np.asarray(g_mm), np.asarray(g_ref),
                               rtol=0, atol=0)


def test_chunk_padding(setup):
    """N not divisible by mm_chunk: pad indices must drop out."""
    enc, blk, master, x = setup
    g_a = jax.grad(_loss)(master, x, blk, 10 ** 9, 64)
    g_b = jax.grad(_loss)(master, x, blk, 10 ** 9, 257)
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_b),
                               atol=1e-6 * float(np.abs(g_a).max()))
