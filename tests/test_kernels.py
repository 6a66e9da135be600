"""Pallas kernel tests (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from sparsefusion_tpu.kernels.attention import (
    imagen_attention,
    reference_attention,
)


def test_imagen_attention_matches_reference(rng):
    b, h, n, d, j = 2, 4, 100, 64, 131  # odd sizes exercise padding
    q = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32)) * 0.2
    k = jnp.asarray(rng.randn(b, j, d).astype(np.float32)) * 0.2
    v = jnp.asarray(rng.randn(b, j, d).astype(np.float32))
    got = imagen_attention(q, k, v, block_q=64, interpret=True)
    want = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_imagen_attention_exact_block(rng):
    b, h, n, d, j = 1, 2, 128, 64, 64
    q = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32)) * 0.1
    k = jnp.asarray(rng.randn(b, j, d).astype(np.float32)) * 0.1
    v = jnp.asarray(rng.randn(b, j, d).astype(np.float32))
    got = imagen_attention(q, k, v, block_q=128, interpret=True)
    want = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
