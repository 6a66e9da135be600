"""Stable-Diffusion KL autoencoder (frozen first stage) in Flax/NHWC.

Re-implementation of the ldm VAE the reference uses to map 256x256 RGB to
32x32x4 latents (``external/ldm/models/autoencoder.py:285-423``, blocks in
``external/ldm/modules/diffusionmodules/model.py``; config
``external/ldm/configs/sd-vae.yaml``: ch=128, ch_mult=(1,2,4,4),
num_res_blocks=2, z=4, no attn except the mid block).

Only ``encode().mode()`` and ``decode()`` are exercised by the pipeline;
both are provided plus ``sample()`` for completeness.  Weights convert from
the SD checkpoint via ``sparsefusion_tpu/train/convert.py``.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    in_channels: int = 3
    out_ch: int = 3
    z_channels: int = 4
    embed_dim: int = 4
    double_z: bool = True


def _norm(name: str):
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                        name=name)


def swish(x):
    return x * jax.nn.sigmoid(x)


class VAEResnetBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _norm("norm1")(x)
        h = swish(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h.astype(self.dtype))
        h = _norm("norm2")(h)
        h = swish(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h.astype(self.dtype))
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="nin_shortcut")(x.astype(self.dtype))
        return x + h


class VAEAttnBlock(nn.Module):
    """Single-head spatial self-attention (model.py:150-214)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hn = _norm("norm")(x).astype(self.dtype)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(hn)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(hn)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(hn)
        q = q.reshape(b, h * w, c)
        k = k.reshape(b, h * w, c)
        v = v.reshape(b, h * w, c)
        attn = jnp.einsum("bic,bjc->bij", q, k) * (c ** -0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bij,bjc->bic", attn.astype(self.dtype), v)
        out = out.reshape(b, h, w, c)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class Encoder(nn.Module):
    config: VAEConfig = VAEConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = nn.Conv(cfg.ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x.astype(self.dtype))
        num_resolutions = len(cfg.ch_mult)
        for i in range(num_resolutions):
            out_ch = cfg.ch * cfg.ch_mult[i]
            for j in range(cfg.num_res_blocks):
                h = VAEResnetBlock(out_ch, dtype=self.dtype,
                                   name=f"down_{i}_block_{j}")(h)
            if i != num_resolutions - 1:
                # torch pads (0,1,0,1) then 3x3 stride-2 valid conv
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(out_ch, (3, 3), strides=2, padding="VALID",
                            dtype=self.dtype, name=f"down_{i}_downsample")(h)
        h = VAEResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_1")(h)
        h = VAEAttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = VAEResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_2")(h)
        h = _norm("norm_out")(h)
        h = swish(h)
        z_out = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return nn.Conv(z_out, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h.astype(self.dtype))


class Decoder(nn.Module):
    config: VAEConfig = VAEConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        num_resolutions = len(cfg.ch_mult)
        block_in = cfg.ch * cfg.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(z.astype(self.dtype))
        h = VAEResnetBlock(block_in, dtype=self.dtype, name="mid_block_1")(h)
        h = VAEAttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = VAEResnetBlock(block_in, dtype=self.dtype, name="mid_block_2")(h)
        for i in reversed(range(num_resolutions)):
            out_ch = cfg.ch * cfg.ch_mult[i]
            for j in range(cfg.num_res_blocks + 1):
                h = VAEResnetBlock(out_ch, dtype=self.dtype,
                                   name=f"up_{i}_block_{j}")(h)
            if i != 0:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
                h = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_{i}_upsample")(h)
        h = _norm("norm_out")(h)
        h = swish(h)
        return nn.Conv(cfg.out_ch, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h.astype(self.dtype))


class AutoencoderKL(nn.Module):
    """encode -> (mean, logvar); decode; mode/sample helpers."""

    config: VAEConfig = VAEConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.config.embed_dim, (1, 1),
                                  dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.config.z_channels, (1, 1),
                                       dtype=self.dtype,
                                       name="post_quant_conv")

    def encode(self, x):
        """(B,H,W,3) in [-1,1] -> (mean, logvar) each (B,H/8,W/8,4)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return mean, logvar

    def encode_mode(self, x):
        """The deterministic latent the pipeline uses (``.mode()``)."""
        mean, _ = self.encode(x)
        return mean

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng=None, sample_posterior: bool = False):
        mean, logvar = self.encode(x)
        if sample_posterior:
            std = jnp.exp(0.5 * logvar)
            z = mean + std * jax.random.normal(rng, mean.shape)
        else:
            z = mean
        return self.decode(z), mean, logvar
