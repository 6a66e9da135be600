"""Tests for the occupancy grid (morton codes, packbits, maintenance)."""
import jax
import jax.numpy as jnp
import numpy as np

from sparsefusion_tpu.render.occupancy import (
    OccupancyGrid,
    morton3D,
    morton3D_invert,
    packbits,
)


def reference_morton(x, y, z):
    out = 0
    for b in range(10):
        out |= ((x >> b) & 1) << (3 * b)
        out |= ((y >> b) & 1) << (3 * b + 1)
        out |= ((z >> b) & 1) << (3 * b + 2)
    return out


def test_morton_roundtrip_and_reference(rng):
    coords = rng.randint(0, 128, (100, 3)).astype(np.int32)
    codes = np.asarray(morton3D(jnp.asarray(coords)))
    for c, code in zip(coords, codes):
        assert code == reference_morton(*c)
    back = np.asarray(morton3D_invert(jnp.asarray(codes)))
    np.testing.assert_array_equal(back, coords)


def test_morton_locality():
    # adjacent cells differ in few bits -> codes nearby on average
    a = morton3D(jnp.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]]))
    np.testing.assert_array_equal(np.asarray(a), [0, 1, 2, 4])


def test_packbits():
    grid = jnp.zeros((1, 16))
    grid = grid.at[0, 3].set(5.0).at[0, 9].set(5.0)
    bf = np.asarray(packbits(grid, 1.0))
    assert bf.shape == (2,)
    assert bf[0] == 1 << 3
    assert bf[1] == 1 << 1  # cell 9 = byte 1, bit 1


def test_occupancy_grid_update_and_query():
    grid = OccupancyGrid(bound=4.0, grid_size=32, density_thresh=0.5)
    assert grid.cascade == 3

    def density_fn(pts):
        # dense ball of radius 0.5 at origin
        return jnp.where(jnp.linalg.norm(pts, axis=-1) < 0.5, 10.0, 0.0)

    grid.update(density_fn, jax.random.PRNGKey(0))
    occ_center = grid.occupancy_at(jnp.zeros((1, 3)))
    occ_far = grid.occupancy_at(jnp.array([[3.5, 3.5, 3.5]]))
    assert bool(occ_center[0])
    assert not bool(occ_far[0])


def test_occupancy_near_far_tightens():
    grid = OccupancyGrid(bound=4.0, grid_size=32, density_thresh=0.5)

    def density_fn(pts):
        return jnp.where(jnp.linalg.norm(pts, axis=-1) < 0.5, 10.0, 0.0)

    grid.update(density_fn, jax.random.PRNGKey(0))
    o = jnp.array([[0.0, 0.0, -8.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    near = jnp.array([4.0])   # box entry
    far = jnp.array([12.0])   # box exit
    nn, nf, hit = grid.occupancy_near_far(o, d, near, far)
    assert bool(hit[0])
    # ball spans z in [-0.5, 0.5] -> t in [7.5, 8.5]; allow jitter+cell slop
    assert 6.5 < float(nn[0]) < 7.6
    assert 8.4 < float(nf[0]) < 9.5

    # a ray that misses the ball entirely
    o2 = jnp.array([[2.0, 2.0, -8.0]])
    nn2, nf2, hit2 = grid.occupancy_near_far(o2, d, near, far)
    assert not bool(hit2[0])
