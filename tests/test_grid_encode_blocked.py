"""Blocked tiled-grid encoding must match the reference implementation
bit-for-bit (same master table parametrization)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsefusion_tpu.nn.ngp import NGPConfig
from sparsefusion_tpu.ops.grid_encode import (
    grid_encode,
    grid_encode_bound,
    init_grid_params,
    make_grid_encoding,
)
from sparsefusion_tpu.ops.grid_encode_blocked import (
    blocked_grid_encode,
    blocked_grid_encode_bound,
    expand_blocked_tables,
    make_blocked_encoding,
)


@pytest.mark.parametrize("levels,log2,scale", [
    (4, 10, 2.0),       # small dense levels
    (6, 7, 1.7),        # capped levels with dropped z strides
])
def test_matches_reference_encoding(rng, levels, log2, scale):
    enc = make_grid_encoding(input_dim=3, num_levels=levels, level_dim=2,
                             base_resolution=4, log2_hashmap_size=log2,
                             per_level_scale=scale, gridtype="tiled")
    blk = make_blocked_encoding(enc)
    table = jnp.asarray(rng.randn(enc.total_params, 2).astype(np.float32))
    x = jnp.asarray(rng.rand(200, 3).astype(np.float32))
    want = grid_encode(x, table, enc)
    tables = expand_blocked_tables(table, blk)
    got = blocked_grid_encode(x, tables, blk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_matches_reference_sf_config(rng):
    """The exact SparseFusion NGP encoding (16 levels, res to 8192)."""
    enc = NGPConfig().encoding()
    blk = make_blocked_encoding(enc)
    table = init_grid_params(jax.random.PRNGKey(0), enc)
    # scale up values so mismatches are visible over the 1e-4 init
    table = table * 1e4
    x = jax.random.uniform(jax.random.PRNGKey(1), (500, 3), minval=-4.0,
                           maxval=4.0)
    want = grid_encode_bound(x, table, enc, bound=4.0)
    got = blocked_grid_encode_bound(x, table, blk, bound=4.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4,
                               rtol=1e-4)


def test_oob_zeroed(rng):
    enc = make_grid_encoding(input_dim=3, num_levels=2, level_dim=2,
                             base_resolution=4, log2_hashmap_size=8,
                             per_level_scale=2.0, gridtype="tiled")
    blk = make_blocked_encoding(enc)
    table = jnp.asarray(rng.randn(enc.total_params, 2).astype(np.float32))
    x = jnp.array([[1.5, 0.5, 0.5], [0.5, 0.5, 0.5]])
    tables = expand_blocked_tables(table, blk)
    out = blocked_grid_encode(x, tables, blk)
    assert np.all(np.asarray(out[0]) == 0)
    assert np.any(np.asarray(out[1]) != 0)


def test_gradients_match_reference(rng):
    enc = make_grid_encoding(input_dim=3, num_levels=3, level_dim=2,
                             base_resolution=4, log2_hashmap_size=8,
                             per_level_scale=1.9, gridtype="tiled")
    blk = make_blocked_encoding(enc)
    table = jnp.asarray(rng.randn(enc.total_params, 2).astype(np.float32))
    x = jnp.asarray(rng.rand(64, 3).astype(np.float32))

    def loss_ref(t):
        return jnp.sum(grid_encode(x, t, enc) ** 2)

    def loss_blk(t):
        return jnp.sum(
            blocked_grid_encode(x, expand_blocked_tables(t, blk), blk) ** 2)

    g_ref = jax.grad(loss_ref)(table)
    g_blk = jax.grad(loss_blk)(table)
    np.testing.assert_allclose(np.asarray(g_blk), np.asarray(g_ref),
                               atol=1e-3, rtol=1e-4)


def test_pallas_gather_path_matches(rng):
    """pallas_gather=True must be value- and grad-identical (interpret
    mode on CPU; the kernel itself is parity-tested in
    test_pallas_gather.py)."""
    enc = make_grid_encoding(input_dim=3, num_levels=3, level_dim=2,
                             base_resolution=4, log2_hashmap_size=8,
                             per_level_scale=1.9, gridtype="tiled")
    blk = make_blocked_encoding(enc)
    table = jnp.asarray(rng.randn(enc.total_params, 2).astype(np.float32))
    x = jnp.asarray(rng.rand(64, 3).astype(np.float32))

    def loss(t, use_pallas):
        tables = expand_blocked_tables(t, blk)
        out = blocked_grid_encode(x, tables, blk, pallas_gather=use_pallas,
                                  pallas_bin_rows=256)
        return jnp.sum(out ** 2), out

    (l_ref, o_ref), g_ref = jax.value_and_grad(loss, has_aux=True)(
        table, False)
    (l_p, o_p), g_p = jax.value_and_grad(loss, has_aux=True)(table, True)
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)
