"""Imagen-style UNet building blocks in Flax (NHWC / channels-last).

Functional re-design of the blocks the SparseFusion UNet actually uses
(``external/imagen_pytorch.py:299-1076``): gamma-only LayerNorms,
single-kv-head self-attention with null key/values, multi-head cross
attention, FiLM ResNet blocks with global-context gating, cross-embed
stems, pixel-shuffle upsampling.  Channels-last means torch's
ChanLayerNorm and 1x1 convs become plain LayerNorm/Dense — XLA fuses these
into the surrounding matmuls on the MXU.

All matmul-bearing modules take a ``dtype`` (activation/compute dtype,
bf16 on TPU) while parameters stay fp32.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class LayerNorm(nn.Module):
    """Gamma-only LayerNorm over the last axis (imagen_pytorch.py:301-314)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (self.dim,), jnp.float32)
        eps = 1e-5 if x.dtype == jnp.float32 else 1e-3
        xf = x.astype(jnp.float32)
        var = jnp.var(xf, axis=-1, keepdims=True)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + eps) * g
        return out.astype(self.dtype)


class LearnedSinusoidalPosEmb(nn.Module):
    """Learned fourier features of the log-SNR (imagen_pytorch.py:624-639)."""

    dim: int = 16

    @nn.compact
    def __call__(self, x):
        half = self.dim // 2
        w = self.param("weights", nn.initializers.normal(1.0), (half,),
                       jnp.float32)
        freqs = x[:, None] * w[None, :] * 2 * math.pi
        return jnp.concatenate(
            [x[:, None], jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


def _ceil8(n: int) -> int:
    return -(-n // 8) * 8


def _use_pallas_attention(n_tokens: int) -> bool:
    """TPU -> fused VMEM-resident kernel (kernels/attention.py); CPU and
    the SF_NO_PALLAS_ATTN=1 kill switch -> plain einsum (identical math,
    parity-tested in tests/test_kernels.py)."""
    import os

    if os.environ.get("SF_NO_PALLAS_ATTN"):
        return False
    return jax.default_backend() == "tpu" and n_tokens >= 64


class Attention(nn.Module):
    """Self-attention with a single shared kv head, null kv, and optional
    extra context tokens (imagen_pytorch.py:480-566).

    Operates on (B, N, dim) tokens.
    """

    dim: int
    dim_head: int = 64
    heads: int = 8
    context_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        b, n, _ = x.shape
        inner = self.dim_head * self.heads
        scale = self.dim_head ** -0.5

        x = LayerNorm(self.dim, dtype=self.dtype, name="norm")(x)
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        kv = nn.Dense(2 * self.dim_head, use_bias=False, dtype=self.dtype,
                      name="to_kv")(x)
        k, v = jnp.split(kv, 2, axis=-1)

        q = q.reshape(b, n, self.heads, self.dim_head)
        q = q * scale

        null_kv = self.param("null_kv", nn.initializers.normal(1.0),
                             (2, self.dim_head), jnp.float32)
        nk = jnp.broadcast_to(null_kv[0], (b, 1, self.dim_head))
        nv = jnp.broadcast_to(null_kv[1], (b, 1, self.dim_head))
        k = jnp.concatenate([nk.astype(self.dtype), k], axis=1)
        v = jnp.concatenate([nv.astype(self.dtype), v], axis=1)

        if context is not None:
            # torch: Sequential(nn.LayerNorm(ctx_dim), Linear) — standard
            # LayerNorm *with* bias (imagen_pytorch.py:504)
            ctx = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                               name="context_norm")(context)
            ckv = nn.Dense(2 * self.dim_head, dtype=self.dtype,
                           name="to_context")(ctx.astype(self.dtype))
            ck, cv = jnp.split(ckv, 2, axis=-1)
            k = jnp.concatenate([ck, k], axis=1)
            v = jnp.concatenate([cv, v], axis=1)

        if _use_pallas_attention(n):
            from sparsefusion_tpu.kernels.attention import imagen_attention

            qh = jnp.transpose(q, (0, 2, 1, 3))  # (b, h, n, d), pre-scaled
            out = imagen_attention(qh, k, v,
                                   block_q=min(512, _ceil8(n)))
            out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, inner)
            out = out.astype(self.dtype)
        else:
            sim = jnp.einsum("bnhd,bjd->bhnj", q, k)
            attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1)
            attn = attn.astype(self.dtype)
            out = jnp.einsum("bhnj,bjd->bnhd", attn, v).reshape(b, n, inner)
        out = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                       name="to_out")(out)
        return LayerNorm(self.dim, dtype=self.dtype, name="out_norm")(out)


class CrossAttention(nn.Module):
    """Multi-head cross-attention with null kv (imagen_pytorch.py:731-805)."""

    dim: int
    context_dim: int
    dim_head: int = 64
    heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        b, n, _ = x.shape
        inner = self.dim_head * self.heads
        scale = self.dim_head ** -0.5

        x = LayerNorm(self.dim, dtype=self.dtype, name="norm")(x)
        # norm_context defaults to Identity in every SF use
        # (imagen_pytorch.py:739,753)
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        kv = nn.Dense(2 * inner, use_bias=False, dtype=self.dtype,
                      name="to_kv")(context)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads_split(t):
            return t.reshape(b, -1, self.heads, self.dim_head)

        q, k, v = map(heads_split, (q, k, v))
        null_kv = self.param("null_kv", nn.initializers.normal(1.0),
                             (2, self.dim_head), jnp.float32)
        nk = jnp.broadcast_to(null_kv[0],
                              (b, 1, self.heads, self.dim_head))
        nv = jnp.broadcast_to(null_kv[1],
                              (b, 1, self.heads, self.dim_head))
        k = jnp.concatenate([nk.astype(self.dtype), k], axis=1)
        v = jnp.concatenate([nv.astype(self.dtype), v], axis=1)

        sim = jnp.einsum("bnhd,bjhd->bhnj", q * scale, k)
        attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1)
        attn = attn.astype(self.dtype)
        out = jnp.einsum("bhnj,bjhd->bnhd", attn, v).reshape(b, n, inner)
        out = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                       name="to_out")(out)
        return LayerNorm(self.dim, dtype=self.dtype, name="out_norm")(out)


class ChanFeedForward(nn.Module):
    """1x1-conv feedforward; in NHWC this is Dense (imagen:953-961)."""

    dim: int
    mult: float = 2.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.mult)
        x = LayerNorm(self.dim, dtype=self.dtype, name="norm_in")(x)
        x = nn.Dense(hidden, use_bias=False, dtype=self.dtype, name="in")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = LayerNorm(hidden, dtype=self.dtype, name="norm_mid")(x)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                        name="out")(x)


class TransformerBlock(nn.Module):
    """depth x (self-attn over hw tokens + chan ff) (imagen:963-988)."""

    dim: int
    depth: int = 1
    heads: int = 8
    dim_head: int = 64
    ff_mult: float = 2.0
    context_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        b, h, w, c = x.shape
        for i in range(self.depth):
            tokens = x.reshape(b, h * w, c)
            tokens = Attention(self.dim, self.dim_head, self.heads,
                               context_dim=self.context_dim,
                               dtype=self.dtype,
                               name=f"attn_{i}")(tokens, context) + tokens
            x = tokens.reshape(b, h, w, c)
            x = ChanFeedForward(self.dim, self.ff_mult, dtype=self.dtype,
                                name=f"ff_{i}")(x) + x
        return x


def FeedForward(dim: int, mult: float = 4.0, dtype=jnp.float32,
                name: str = "ff"):
    """Token feedforward (imagen_pytorch.py:943-951) as a Module factory."""

    class _FF(nn.Module):
        @nn.compact
        def __call__(self, x):
            hidden = int(dim * mult)
            x = LayerNorm(dim, dtype=dtype, name="norm_in")(x)
            x = nn.Dense(hidden, use_bias=False, dtype=dtype, name="in")(x)
            x = jax.nn.gelu(x, approximate=False)
            x = LayerNorm(hidden, dtype=dtype, name="norm_mid")(x)
            return nn.Dense(dim, use_bias=False, dtype=dtype, name="out")(x)

    return _FF(name=name)


class PerceiverAttention(nn.Module):
    """Latent-query attention over tokens+latents (imagen:357-422)."""

    dim: int
    dim_head: int = 64
    heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, latents):
        b = x.shape[0]
        inner = self.dim_head * self.heads
        scale = self.dim_head ** -0.5
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        latents = nn.LayerNorm(epsilon=1e-5, name="norm_latents")(latents)
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     name="to_q")(latents)
        kv_in = jnp.concatenate([x, latents], axis=-2)
        kv = nn.Dense(2 * inner, use_bias=False, dtype=self.dtype,
                      name="to_kv")(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)

        def split_heads(t):
            return t.reshape(b, -1, self.heads, self.dim_head)

        q, k, v = map(split_heads, (q, k, v))
        sim = jnp.einsum("bnhd,bjhd->bhnj", q * scale, k)
        attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhnj,bjhd->bnhd", attn.astype(self.dtype), v)
        out = out.reshape(b, -1, inner)
        out = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                       name="to_out")(out)
        return nn.LayerNorm(epsilon=1e-5, name="out_norm")(out)


class PerceiverResampler(nn.Module):
    """Attention pooling of conditioning tokens (imagen:424-476); part of
    the imagen block inventory — unused in the SparseFusion config
    (attn_pool_text=False) but provided for other model families."""

    dim: int
    depth: int = 2
    dim_head: int = 64
    heads: int = 8
    num_latents: int = 64
    num_latents_mean_pooled: int = 4
    max_seq_len: int = 512
    ff_mult: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, _ = x.shape
        pos = self.param("pos_emb", nn.initializers.normal(1.0),
                         (self.max_seq_len, self.dim), jnp.float32)
        x = x + pos[:n]
        latents = self.param("latents", nn.initializers.normal(1.0),
                             (self.num_latents, self.dim), jnp.float32)
        latents = jnp.broadcast_to(latents[None], (b, *latents.shape))
        latents = latents.astype(self.dtype)
        if self.num_latents_mean_pooled > 0:
            pooled = jnp.mean(x, axis=1)
            pooled = LayerNorm(self.dim, dtype=self.dtype,
                               name="pool_norm")(pooled)
            pooled = nn.Dense(self.dim * self.num_latents_mean_pooled,
                              dtype=self.dtype, name="pool_proj")(pooled)
            pooled = pooled.reshape(b, self.num_latents_mean_pooled,
                                    self.dim)
            latents = jnp.concatenate([pooled, latents], axis=-2)
        for i in range(self.depth):
            latents = PerceiverAttention(
                self.dim, self.dim_head, self.heads, dtype=self.dtype,
                name=f"attn_{i}")(x, latents) + latents
            latents = FeedForward(self.dim, self.ff_mult, dtype=self.dtype,
                                  name=f"ff_{i}")(latents) + latents
        return latents


class GlobalContext(nn.Module):
    """Squeeze-excite-style gating (imagen_pytorch.py:916-941)."""

    dim_in: int
    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        context = nn.Dense(1, dtype=self.dtype, name="to_k")(x)  # (b,h,w,1)
        context = context.reshape(b, h * w, 1)
        attn = jax.nn.softmax(context.astype(jnp.float32), axis=1)
        attn = attn.astype(self.dtype)
        pooled = jnp.einsum("bnk,bnc->bkc", attn, x.reshape(b, h * w, c))
        pooled = pooled.reshape(b, 1, 1, c)
        hidden = max(3, self.dim_out // 2)
        g = nn.Dense(hidden, dtype=self.dtype, name="net_in")(pooled)
        g = jax.nn.silu(g)
        g = nn.Dense(self.dim_out, dtype=self.dtype, name="net_out")(g)
        return jax.nn.sigmoid(g)


class Block(nn.Module):
    """GroupNorm -> (FiLM) -> SiLU -> 3x3 conv (imagen_pytorch.py:641-662)."""

    dim_out: int
    groups: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale_shift=None):
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         dtype=jnp.float32, name="groupnorm")(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1) + shift
        x = jax.nn.silu(x)
        return nn.Conv(self.dim_out, (3, 3), padding=1, dtype=self.dtype,
                       name="project")(x.astype(self.dtype))


class ResnetBlock(nn.Module):
    """FiLM ResNet block with optional cross-attn and GCA gate
    (imagen_pytorch.py:664-729)."""

    dim: int
    dim_out: int
    cond_dim: Optional[int] = None
    time_cond_dim: Optional[int] = None
    groups: int = 8
    use_gca: bool = False
    attn_heads: int = 8
    attn_dim_head: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_emb=None, cond=None):
        scale_shift = None
        if self.time_cond_dim is not None and time_emb is not None:
            t = jax.nn.silu(time_emb)
            t = nn.Dense(self.dim_out * 2, dtype=self.dtype,
                         name="time_mlp")(t)
            t = t[:, None, None, :]
            scale_shift = jnp.split(t, 2, axis=-1)

        h = Block(self.dim_out, self.groups, dtype=self.dtype,
                  name="block1")(x)

        if self.cond_dim is not None:
            b, hh, ww, c = h.shape
            tokens = h.reshape(b, hh * ww, c)
            tokens = CrossAttention(
                self.dim_out, self.cond_dim, self.attn_dim_head,
                self.attn_heads, dtype=self.dtype,
                name="cross_attn")(tokens, cond) + tokens
            h = tokens.reshape(b, hh, ww, c)

        h = Block(self.dim_out, self.groups, dtype=self.dtype,
                  name="block2")(h, scale_shift=scale_shift)

        if self.use_gca:
            h = h * GlobalContext(self.dim_out, self.dim_out,
                                  dtype=self.dtype, name="gca")(h)

        if self.dim != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype,
                        name="res_conv")(x)
        return h + x


class CrossEmbedLayer(nn.Module):
    """Multi-kernel stem conv (imagen_pytorch.py:1017-1042)."""

    dim_out: int
    kernel_sizes: Sequence[int] = (3, 7, 15)
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel_sizes = sorted(self.kernel_sizes)
        num_scales = len(kernel_sizes)
        dim_scales = [int(self.dim_out / (2 ** i))
                      for i in range(1, num_scales)]
        dim_scales.append(self.dim_out - sum(dim_scales))
        outs = []
        for i, (k, d) in enumerate(zip(kernel_sizes, dim_scales)):
            outs.append(nn.Conv(d, (k, k), strides=self.stride,
                                padding=(k - self.stride) // 2,
                                dtype=self.dtype, name=f"conv_{i}")(x))
        return jnp.concatenate(outs, axis=-1)


class Downsample(nn.Module):
    """4x4 stride-2 conv (imagen_pytorch.py:608-610)."""

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.dim_out, (4, 4), strides=2, padding=1,
                       dtype=self.dtype, name="conv")(x)


class ParallelConvs(nn.Module):
    """Last-level 'downsample': 3x3 conv + 1x1 conv summed (imagen:1322)."""

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        a = nn.Conv(self.dim_out, (3, 3), padding=1, dtype=self.dtype,
                    name="conv3")(x)
        b = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype, name="conv1")(x)
        return a + b


def pixel_shuffle(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """NHWC pixel shuffle matching torch.nn.PixelShuffle channel order."""
    b, h, w, c4 = x.shape
    c = c4 // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
    return x.reshape(b, h * r, w * r, c)


class PixelShuffleUpsample(nn.Module):
    """1x1 conv -> SiLU -> pixel shuffle (imagen_pytorch.py:578-606)."""

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.dim_out * 4, (1, 1), dtype=self.dtype,
                    name="conv")(x)
        x = jax.nn.silu(x)
        return pixel_shuffle(x, 2)
