"""The SparseFusion view-conditioned UNet (imagen-style) in Flax/NHWC.

Re-designed from ``external/imagen_pytorch.py:1078-1671`` for the exact
configuration SparseFusion instantiates (``utils/load_model.py:60-69``):

    dim=256, dim_mults=(1,2,4,4), num_resnet_blocks=(2,2,2,2),
    layer_attns=(F,F,F,T), layer_cross_attns all False, channels=4,
    cond_images_channels=256, no text path (cond_on_z=False),
    no lowres cascade, pixel-shuffle upsamplers, CrossEmbed stem.

Conditioning is a 256-channel EFT feature image concatenated to the latent
at the stem; classifier-free guidance drops it via a per-sample keep mask
(``imagen_pytorch.py:1496-1504``).  The only tokens entering attention
context are the two learned time tokens.

The module is called with the log-SNR as the continuous time signal, same
as the reference (``DDPM.p_mean_variance`` passes
``noise_scheduler.get_condition(t)``).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from sparsefusion_tpu.nn.layers import (
    Attention,
    Block,
    CrossEmbedLayer,
    Downsample,
    LayerNorm,
    LearnedSinusoidalPosEmb,
    ParallelConvs,
    PixelShuffleUpsample,
    ResnetBlock,
    TransformerBlock,
)
from sparsefusion_tpu.ops.image import resize_nearest


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    dim: int = 256
    dim_mults: Tuple[int, ...] = (1, 2, 4, 4)
    num_resnet_blocks: Tuple[int, ...] = (2, 2, 2, 2)
    layer_attns: Tuple[bool, ...] = (False, False, False, True)
    layer_attns_depth: int = 1
    layer_cross_attns: Tuple[bool, ...] = (False, False, False, False)
    channels: int = 4
    channels_out: int = 4
    cond_images_channels: int = 256
    attn_heads: int = 8
    attn_dim_head: int = 64
    ff_mult: float = 2.0
    learned_sinu_pos_emb_dim: int = 16
    num_time_tokens: int = 2
    resnet_groups: int = 8
    init_cross_embed_kernel_sizes: Tuple[int, ...] = (3, 7, 15)
    attend_at_middle: bool = True
    scale_skip_connection: bool = True
    final_resnet_block: bool = True
    final_conv_kernel_size: int = 3

    @property
    def cond_dim(self) -> int:
        return self.dim

    @property
    def time_cond_dim(self) -> int:
        return self.dim * 4


def sparsefusion_unet_config() -> UNetConfig:
    """The canonical SF hyperparameters (``utils/load_model.py:60-69``)."""
    return UNetConfig()


class EfficientUNet(nn.Module):
    """SparseFusion latent UNet.  Input (B, H, W, C_latent)."""

    config: UNetConfig = UNetConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, log_snr: jnp.ndarray,
                 cond_images: Optional[jnp.ndarray] = None,
                 cond_keep_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cfg = self.config
        b = x.shape[0]
        dt = self.dtype
        x = x.astype(dt)

        # ---- image conditioning: concat [cond, x] at the stem -------------
        if cfg.cond_images_channels > 0:
            assert cond_images is not None
            assert cond_images.shape[-1] == cfg.cond_images_channels
            if cond_images.shape[1:3] != x.shape[1:3]:
                cond_images = resize_nearest(cond_images, x.shape[1:3])
            if cond_keep_mask is not None:
                keep = cond_keep_mask.astype(dt)[:, None, None, None]
                cond_images = cond_images.astype(dt) * keep
            x = jnp.concatenate([cond_images.astype(dt), x], axis=-1)

        x = CrossEmbedLayer(cfg.dim, cfg.init_cross_embed_kernel_sizes,
                            stride=1, dtype=dt, name="init_conv")(x)

        # ---- time conditioning --------------------------------------------
        time_hiddens = LearnedSinusoidalPosEmb(
            cfg.learned_sinu_pos_emb_dim, name="sinu_pos_emb")(
                log_snr.astype(jnp.float32))
        time_hiddens = nn.Dense(cfg.time_cond_dim, dtype=dt,
                                name="to_time_hiddens")(time_hiddens)
        time_hiddens = jax.nn.silu(time_hiddens)
        time_tokens = nn.Dense(cfg.cond_dim * cfg.num_time_tokens, dtype=dt,
                               name="to_time_tokens")(time_hiddens)
        time_tokens = time_tokens.reshape(b, cfg.num_time_tokens, cfg.cond_dim)
        t = nn.Dense(cfg.time_cond_dim, dtype=dt, name="to_time_cond")(
            time_hiddens)

        # torch uses nn.LayerNorm (with bias) here (imagen_pytorch.py:1214)
        c = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="norm_cond")(time_tokens).astype(dt)

        # ---- down path -----------------------------------------------------
        dims = [cfg.dim] + [cfg.dim * m for m in cfg.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        num_resolutions = len(in_out)
        hiddens = []
        for i, (dim_in, dim_out) in enumerate(in_out):
            is_last = i >= num_resolutions - 1
            layer_cond_dim = cfg.cond_dim if cfg.layer_cross_attns[i] else None
            x = ResnetBlock(
                dim_in, dim_in, cond_dim=layer_cond_dim,
                time_cond_dim=cfg.time_cond_dim, groups=cfg.resnet_groups,
                dtype=dt, name=f"down_{i}_init")(x, t, c)
            for j in range(cfg.num_resnet_blocks[i]):
                x = ResnetBlock(
                    dim_in, dim_in, time_cond_dim=cfg.time_cond_dim,
                    groups=cfg.resnet_groups, use_gca=True, dtype=dt,
                    name=f"down_{i}_res_{j}")(x, t)
                hiddens.append(x)
            if cfg.layer_attns[i]:
                x = TransformerBlock(
                    dim_in, depth=cfg.layer_attns_depth, heads=cfg.attn_heads,
                    dim_head=cfg.attn_dim_head, ff_mult=cfg.ff_mult,
                    context_dim=cfg.cond_dim, dtype=dt,
                    name=f"down_{i}_attn")(x, c)
            hiddens.append(x)
            if not is_last:
                x = Downsample(dim_out, dtype=dt, name=f"down_{i}_ds")(x)
            else:
                x = ParallelConvs(dim_out, dtype=dt, name=f"down_{i}_ds")(x)

        # ---- middle ---------------------------------------------------------
        mid_dim = dims[-1]
        x = ResnetBlock(mid_dim, mid_dim, cond_dim=cfg.cond_dim,
                        time_cond_dim=cfg.time_cond_dim,
                        groups=cfg.resnet_groups, dtype=dt,
                        name="mid_block1")(x, t, c)
        if cfg.attend_at_middle:
            bb, hh, ww, cc = x.shape
            tokens = x.reshape(bb, hh * ww, cc)
            tokens = Attention(mid_dim, cfg.attn_dim_head, cfg.attn_heads,
                               dtype=dt, name="mid_attn")(tokens) + tokens
            x = tokens.reshape(bb, hh, ww, cc)
        x = ResnetBlock(mid_dim, mid_dim, cond_dim=cfg.cond_dim,
                        time_cond_dim=cfg.time_cond_dim,
                        groups=cfg.resnet_groups, dtype=dt,
                        name="mid_block2")(x, t, c)

        # ---- up path --------------------------------------------------------
        skip_scale = 2 ** -0.5 if cfg.scale_skip_connection else 1.0

        def add_skip(x):
            return jnp.concatenate([x, hiddens.pop() * skip_scale], axis=-1)

        rev_in_out = list(reversed(in_out))
        rev_nrb = list(reversed(cfg.num_resnet_blocks))
        rev_attns = list(reversed(cfg.layer_attns))
        rev_cross = list(reversed(cfg.layer_cross_attns))
        for i, (dim_in, dim_out) in enumerate(rev_in_out):
            is_last = i == num_resolutions - 1
            layer_cond_dim = cfg.cond_dim if rev_cross[i] else None
            skip_dim = hiddens[-1].shape[-1]
            x = add_skip(x)
            x = ResnetBlock(
                dim_out + skip_dim, dim_out, cond_dim=layer_cond_dim,
                time_cond_dim=cfg.time_cond_dim, groups=cfg.resnet_groups,
                dtype=dt, name=f"up_{i}_init")(x, t, c)
            for j in range(rev_nrb[i]):
                skip_dim = hiddens[-1].shape[-1]
                x = add_skip(x)
                x = ResnetBlock(
                    dim_out + skip_dim, dim_out,
                    time_cond_dim=cfg.time_cond_dim,
                    groups=cfg.resnet_groups, use_gca=True, dtype=dt,
                    name=f"up_{i}_res_{j}")(x, t)
            if rev_attns[i]:
                x = TransformerBlock(
                    dim_out, depth=cfg.layer_attns_depth,
                    heads=cfg.attn_heads, dim_head=cfg.attn_dim_head,
                    ff_mult=cfg.ff_mult, context_dim=cfg.cond_dim, dtype=dt,
                    name=f"up_{i}_attn")(x, c)
            if not is_last:
                x = PixelShuffleUpsample(dim_in, dtype=dt,
                                         name=f"up_{i}_us")(x)

        # ---- head -----------------------------------------------------------
        if cfg.final_resnet_block:
            x = ResnetBlock(cfg.dim, cfg.dim, time_cond_dim=cfg.time_cond_dim,
                            groups=cfg.resnet_groups, use_gca=True, dtype=dt,
                            name="final_res_block")(x, t)
        k = cfg.final_conv_kernel_size
        out = nn.Conv(cfg.channels_out, (k, k), padding=k // 2,
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros,
                      dtype=dt, name="final_conv")(x)
        return out.astype(jnp.float32)


def make_denoise_fn(model: EfficientUNet, params):
    """Bind params into the ``denoise_fn(x, log_snr, cond, keep)`` contract
    used by :mod:`sparsefusion_tpu.diffusion`."""

    def denoise_fn(x, log_snr, cond_images, keep_mask):
        return model.apply({"params": params}, x, log_snr, cond_images,
                           keep_mask)

    return denoise_fn
