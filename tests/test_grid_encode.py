"""Grid-encoding tests: numpy oracle parity, gradients, SF config."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsefusion_tpu.ops.grid_encode import (
    GridEncoding,
    grid_encode,
    grid_encode_bound,
    init_grid_params,
    make_grid_encoding,
)

PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint64)


def numpy_oracle(x01, table, enc: GridEncoding):
    """Naive per-point/per-level implementation of the NGP encoding rules."""
    B, D = x01.shape
    L, C = enc.num_levels, enc.level_dim
    out = np.zeros((B, L * C), np.float32)
    for b in range(B):
        if np.any(x01[b] < 0) or np.any(x01[b] > 1):
            continue
        for lvl in range(L):
            size = int(enc.offsets[lvl + 1] - enc.offsets[lvl])
            scale = float(enc.scales[lvl])
            res = int(enc.resolutions[lvl])
            pos = x01[b] * scale + 0.5
            pg = np.floor(pos).astype(np.uint64)
            frac = pos - pg
            acc = np.zeros(C, np.float32)
            for corner in range(2 ** D):
                w = 1.0
                local = np.zeros(D, np.uint64)
                for d in range(D):
                    if (corner >> d) & 1:
                        w *= frac[d]
                        local[d] = pg[d] + 1
                    else:
                        w *= 1 - frac[d]
                        local[d] = pg[d]
                # stride-based index with per-dim inclusion
                stride = 1
                index = 0
                for d in range(D):
                    if stride > size:
                        break
                    index += int(local[d]) * stride
                    stride *= res + 1
                if enc.gridtype == "hash" and stride > size:
                    h = np.uint64(0)
                    for d in range(D):
                        h ^= (local[d] * PRIMES[d]) & np.uint64(0xFFFFFFFF)
                    index = int(h & np.uint64(0xFFFFFFFF))
                flat = index % size + int(enc.offsets[lvl])
                acc += w * table[flat]
            out[b, lvl * C:(lvl + 1) * C] = acc
    return out


@pytest.mark.parametrize("gridtype", ["tiled", "hash"])
def test_matches_numpy_oracle(rng, gridtype):
    enc = make_grid_encoding(input_dim=3, num_levels=6, level_dim=2,
                             base_resolution=4, log2_hashmap_size=7,
                             per_level_scale=1.7, gridtype=gridtype)
    table = rng.randn(enc.total_params, 2).astype(np.float32)
    x = rng.rand(32, 3).astype(np.float32)
    x[0] = [-0.1, 0.5, 0.5]  # oob
    got = np.asarray(grid_encode(jnp.asarray(x), jnp.asarray(table), enc))
    want = numpy_oracle(x, table, enc)
    np.testing.assert_allclose(got, want, atol=1e-4)
    assert np.all(got[0] == 0)  # oob -> zeros


def test_sf_tiledgrid_config():
    """The exact NGP encoder config SparseFusion uses (network_grid.py:50)."""
    bound = 4
    enc = make_grid_encoding(input_dim=3, num_levels=16, level_dim=2,
                             base_resolution=16, log2_hashmap_size=16,
                             desired_resolution=2048 * bound,
                             gridtype="tiled")
    assert enc.output_dim == 32
    # per_level_scale = exp2(log2(8192/16)/15) = 2^0.6
    np.testing.assert_allclose(enc.per_level_scale, 2 ** 0.6, rtol=1e-6)
    # level sizes capped at 2^16 (rounded to 8)
    sizes = enc.offsets[1:] - enc.offsets[:-1]
    assert sizes.max() == 65536
    # level 0: res 16 -> (16+1)^3 = 4913 params, rounded up to 4920
    assert sizes[0] == np.ceil(min(2 ** 16, 17 ** 3) / 8) * 8
    # encode random points end to end
    table = init_grid_params(jax.random.PRNGKey(0), enc)
    x = jax.random.uniform(jax.random.PRNGKey(1), (128, 3),
                           minval=-bound, maxval=bound)
    out = grid_encode_bound(x, table, enc, bound=bound)
    assert out.shape == (128, 32)
    assert np.all(np.isfinite(np.asarray(out)))


def test_interpolation_is_exact_at_vertices():
    enc = make_grid_encoding(input_dim=2, num_levels=1, level_dim=1,
                             base_resolution=5, log2_hashmap_size=10,
                             per_level_scale=2.0, gridtype="tiled")
    table = np.arange(enc.total_params, dtype=np.float32)[:, None]
    # with align_corners=False, pos = x*scale + 0.5; choose x so pos is integral
    scale = float(enc.scales[0])  # 4.0
    x = np.array([[0.5 / scale, 1.5 / scale]], np.float32)
    got = np.asarray(grid_encode(jnp.asarray(x), jnp.asarray(table), enc))
    # pos = (1.0, 2.0) -> vertex (1, 2) -> index 1 + 2*(res+1)
    res = int(enc.resolutions[0])
    want = table[1 + 2 * (res + 1), 0]
    np.testing.assert_allclose(got[0, 0], want, atol=1e-5)


def test_gradient_is_scatter_add(rng):
    enc = make_grid_encoding(input_dim=3, num_levels=2, level_dim=2,
                             base_resolution=4, log2_hashmap_size=8,
                             per_level_scale=2.0, gridtype="tiled")
    table = jnp.asarray(rng.randn(enc.total_params, 2).astype(np.float32))
    x_single = jnp.asarray(rng.rand(1, 3).astype(np.float32))
    x_double = jnp.concatenate([x_single, x_single])

    def loss(t, pts):
        return grid_encode(pts, t, enc).sum()

    g1 = jax.grad(loss)(table, x_single)
    g2 = jax.grad(loss)(table, x_double)
    # two identical points accumulate double the gradient
    np.testing.assert_allclose(np.asarray(g2), 2 * np.asarray(g1), atol=1e-5)
    # gradient sums to (#points * #levels) since weights sum to 1 per level
    np.testing.assert_allclose(float(g1.sum()), 2 * 2, atol=1e-4)


def test_gradient_matches_finite_differences(rng):
    enc = make_grid_encoding(input_dim=2, num_levels=2, level_dim=1,
                             base_resolution=3, log2_hashmap_size=6,
                             per_level_scale=1.5, gridtype="hash")
    table = rng.randn(enc.total_params, 1).astype(np.float32)
    x = jnp.asarray(rng.rand(4, 2).astype(np.float32))

    def loss(t):
        out = grid_encode(x, t, enc)
        return (out ** 2).sum()

    g = np.asarray(jax.grad(loss)(jnp.asarray(table)))
    eps = 1e-3
    for flat_idx in [0, 5, 17]:
        tp = table.copy()
        tp[flat_idx, 0] += eps
        tm = table.copy()
        tm[flat_idx, 0] -= eps
        fd = (float(loss(jnp.asarray(tp))) - float(loss(jnp.asarray(tm)))) \
            / (2 * eps)
        np.testing.assert_allclose(g[flat_idx, 0], fd, atol=1e-2)
