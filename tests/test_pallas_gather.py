"""Parity tests for the VMEM row-gather kernel (interpret mode, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsefusion_tpu.kernels.grid_gather import vmem_row_gather


@pytest.mark.parametrize("t_rows,w,n", [
    (256, 108, 384),   # multi-bin, multi-chunk, padded lanes+rows
    (128, 128, 128),   # exactly one bin/chunk
    (300, 64, 100),    # non-multiple table rows and point count
])
def test_vmem_row_gather_matches_take(t_rows, w, n):
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (t_rows, w), jnp.float32)
    krow = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, t_rows,
                              jnp.int32)
    out = vmem_row_gather(table, krow, bin_rows=128, interpret=True)
    ref = jnp.take(table, krow, axis=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


def test_vmem_row_gather_bf16():
    table = jax.random.normal(jax.random.PRNGKey(0), (256, 108),
                              jnp.float32).astype(jnp.bfloat16)
    krow = jax.random.randint(jax.random.PRNGKey(1), (256,), 0, 256,
                              jnp.int32)
    out = vmem_row_gather(table, krow, bin_rows=128, interpret=True)
    ref = jnp.take(table, krow, axis=0)
    np.testing.assert_array_equal(np.asarray(out).astype(np.float32),
                                  np.asarray(ref).astype(np.float32))


def test_vmem_row_gather_grad_matches_take_grad():
    table = jax.random.normal(jax.random.PRNGKey(0), (256, 32), jnp.float32)
    krow = jax.random.randint(jax.random.PRNGKey(1), (192,), 0, 256,
                              jnp.int32)
    cot = jax.random.normal(jax.random.PRNGKey(2), (192, 32), jnp.float32)

    def f_pallas(t):
        return jnp.sum(vmem_row_gather(t, krow, bin_rows=128,
                                       interpret=True) * cot)

    def f_ref(t):
        return jnp.sum(jnp.take(t, krow, axis=0) * cot)

    g_p = jax.grad(f_pallas)(table)
    g_r = jax.grad(f_ref)(table)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r), atol=1e-6)
