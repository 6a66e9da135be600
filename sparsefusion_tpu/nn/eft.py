"""Epipolar Feature Transformer (EFT) in Flax.

TPU-first re-design of ``sparsefusion/eft.py:19-525``: a generalizable
light-field network that, per query ray, samples multi-scale ResNet18
features at the epipolar points of every context view and aggregates them
with three tiny transformers:

    T1 attends across *context views* per epipolar point,
    T2 attends across *depth samples* per (view, ray) + attention-pooled,
    T3 attends across *views* per ray + attention-pooled,

yielding per-ray RGB (sigmoid head) and a 256-d feature that conditions
the VLDM.  Transformer encoders mirror torch
``nn.TransformerEncoderLayer(d_model=256, nhead=1, ff=256, post-norm,
relu)`` so checkpoints convert 1:1.

Everything is fixed-shape: (n_rays, n_depth) chunks map over a ``lax.map``
in :func:`batched_forward`, replacing the reference's Python chunking
(``eft.py:470-505``).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from sparsefusion_tpu.core.cameras import (
    Cameras,
    camera_centers,
    transform_points_ndc,
)
from sparsefusion_tpu.core.harmonics import HarmonicEmbedding
from sparsefusion_tpu.nn.resnet import ResNet18Features
from sparsefusion_tpu.ops.image import grid_sample_bilinear


@dataclasses.dataclass(frozen=True)
class EFTConfig:
    use_r: bool = True
    n_harmonic_functions: int = 6
    omega0: float = 1.0
    in_dim: int = 3
    out_dim: int = 3
    out_sigmoid: bool = True
    intermediate_dim: int = 256
    n_transformer_layers: int = 4
    feat_size: int = 512  # resnet18 pyramid channels
    return_features: bool = True

    @property
    def ray_dim(self) -> int:  # plucker(6) harmonic
        return 6 * (2 * self.n_harmonic_functions + 1)

    @property
    def depth_dim(self) -> int:
        return 1 * (2 * self.n_harmonic_functions + 1)

    @property
    def patch_dim(self) -> int:
        return self.feat_size + self.in_dim


class TorchEncoderLayer(nn.Module):
    """torch nn.TransformerEncoderLayer (post-norm, relu, nhead=1) on
    (B, S, E) tokens with attention over S."""

    d_model: int
    dim_feedforward: int
    nhead: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, s, e = x.shape
        qkv = nn.Dense(3 * self.d_model, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = self.d_model // self.nhead
        q = q.reshape(b, s, self.nhead, hd)
        k = k.reshape(b, s, self.nhead, hd)
        v = v.reshape(b, s, self.nhead, hd)
        sim = jnp.einsum("bihd,bjhd->bhij", q, k) / jnp.sqrt(
            jnp.asarray(hd, jnp.float32)).astype(self.dtype)
        attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", attn.astype(self.dtype), v)
        out = out.reshape(b, s, self.d_model)
        out = nn.Dense(self.d_model, dtype=self.dtype, name="out_proj")(out)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x + out)
        y = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                     name="linear1")(x)
        y = jax.nn.relu(y)
        y = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(y)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                            name="norm2")(x + y)


class TransformerEncoder(nn.Module):
    """pre-Linear+GELU then N TorchEncoderLayers (``eft.py:19-51``)."""

    d_in: int
    n_hidden: int = 256
    n_layer: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, w):
        out = nn.Dense(self.n_hidden, dtype=self.dtype, name="pre")(w)
        out = jax.nn.gelu(out, approximate=False)
        for i in range(self.n_layer):
            out = TorchEncoderLayer(self.n_hidden, self.n_hidden,
                                    dtype=self.dtype,
                                    name=f"layer_{i}")(out)
        return out


class EpipolarFeatureTransformer(nn.Module):
    """Functional EFT: encode context views once, then query rays."""

    config: EFTConfig = EFTConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.encoder_model = ResNet18Features(in_dim=cfg.in_dim,
                                              dtype=self.dtype)
        self.harmonic = HarmonicEmbedding(cfg.n_harmonic_functions,
                                          cfg.omega0)
        t1_in = cfg.ray_dim + cfg.depth_dim + cfg.patch_dim
        t2_in = (2 if cfg.use_r else 1) * cfg.ray_dim + cfg.depth_dim \
            + cfg.intermediate_dim
        t3_in = (2 if cfg.use_r else 1) * cfg.ray_dim + cfg.intermediate_dim
        self.t1 = TransformerEncoder(t1_in, cfg.intermediate_dim,
                                     dtype=self.dtype)
        self.t2 = TransformerEncoder(t2_in, cfg.intermediate_dim,
                                     dtype=self.dtype)
        self.t3 = TransformerEncoder(t3_in, cfg.intermediate_dim,
                                     dtype=self.dtype)
        self.t2_attn = nn.Dense(1, dtype=self.dtype)
        self.t3_attn = nn.Dense(1, dtype=self.dtype)
        self.color_layer = nn.Dense(self.config.out_dim, dtype=self.dtype)

    def encode(self, input_images: jnp.ndarray, train: bool = False):
        """(NC, H, W, 3) -> (NC, H/2, W/2, 512) feature pyramid."""
        return self.encoder_model(input_images, train=train)

    def encode_plucker(self, ray_origins, ray_dirs):
        """Plucker coords + harmonic embedding (``eft.py:208-214``)."""
        plucker = jnp.concatenate(
            [ray_dirs, jnp.cross(ray_origins, ray_dirs)], axis=-1)
        return self.harmonic(plucker)

    def __call__(self, origins: jnp.ndarray, directions: jnp.ndarray,
                 lengths: jnp.ndarray, input_cameras: Cameras,
                 input_images: jnp.ndarray, encoder_latent: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Query a chunk of rays.

        Args:
            origins/directions: (N, 3) world rays (directions unnormalized,
                unit view-space z, as produced by the grid sampler).
            lengths: (N, D) depths along each ray.
            input_cameras: NC context cameras (relative frame).
            input_images: (NC, H, W, 3).
            encoder_latent: (NC, H/2, W/2, 512) from :meth:`encode`.

        Returns:
            rgb (N, 3), features (N, 256).
        """
        cfg = self.config
        N, D = lengths.shape
        NC = input_images.shape[0]

        # world points along rays
        xyz = origins[:, None, :] + directions[:, None, :] \
            * lengths[..., None]                      # (N, D, 3)

        # epipolar projection into every context view
        xyz_flat = xyz.reshape(1, N * D, 3)
        xy_cam = transform_points_ndc(input_cameras, xyz_flat)[..., :2]
        # grid_sample needs sign-flipped NDC (eft.py:254)
        feats = grid_sample_bilinear(encoder_latent, -xy_cam)  # (NC, ND, 512)
        rgb_feats = grid_sample_bilinear(input_images, -xy_cam)
        feats = feats.reshape(NC, N, D, cfg.feat_size)
        rgb_feats = rgb_feats.reshape(NC, N, D, cfg.in_dim)
        features = jnp.concatenate([feats, rgb_feats], axis=-1)

        # reference plucker: rays from each context camera to the points
        origins_cam = camera_centers(input_cameras)   # (NC, 3)
        origins_b = jnp.broadcast_to(origins_cam[:, None, None, :],
                                     (NC, N, D, 3))
        input_dirs = xyz[None] - origins_b
        input_dirs = input_dirs / jnp.maximum(
            jnp.linalg.norm(input_dirs, axis=-1, keepdims=True), 1e-12)
        reference_plucker = self.encode_plucker(origins_b, input_dirs)

        depths = self.harmonic(lengths[..., None])    # (N, D, 13)
        depths_b = jnp.broadcast_to(depths[None], (NC, N, D, cfg.depth_dim))

        q_dirs = directions / jnp.maximum(
            jnp.linalg.norm(directions, axis=-1, keepdims=True), 1e-12)
        query_plucker = self.encode_plucker(origins, q_dirs)  # (N, 78)

        # ---- T1: attend across context views per epipolar point ----------
        # torch layout (S=nc, B=n*d, E) -> here (B=n*d, S=nc, E)
        t1_in = jnp.concatenate([reference_plucker, depths_b, features],
                                axis=-1)
        t1_tokens = t1_in.transpose(1, 2, 0, 3).reshape(N * D, NC, -1)
        f1 = self.t1(t1_tokens.astype(self.dtype))
        f1 = f1.reshape(N, D, NC, -1).transpose(2, 0, 1, 3)  # (NC, N, D, F)

        # ---- T2: attend across depth per (view, ray) ----------------------
        qp = jnp.broadcast_to(query_plucker[None, :, None, :],
                              (NC, N, D, cfg.ray_dim))
        if cfg.use_r:
            t2_in = jnp.concatenate([qp, reference_plucker, depths_b, f1],
                                    axis=-1)
        else:
            t2_in = jnp.concatenate([qp, depths_b, f1], axis=-1)
        t2_tokens = t2_in.reshape(NC * N, D, -1)
        f2 = self.t2(t2_tokens.astype(self.dtype)).reshape(NC, N, D, -1)
        t2_w = jax.nn.softmax(self.t2_attn(f2).astype(jnp.float32), axis=-2)
        f2 = jnp.sum(f2 * t2_w.astype(f2.dtype), axis=-2)    # (NC, N, F)

        # ---- T3: attend across views per ray ------------------------------
        qp3 = jnp.broadcast_to(query_plucker[None], (NC, N, cfg.ray_dim))
        rp3 = reference_plucker[:, :, D // 2, :]
        if cfg.use_r:
            t3_in = jnp.concatenate([qp3, rp3, f2], axis=-1)
        else:
            t3_in = jnp.concatenate([qp3, f2], axis=-1)
        t3_tokens = t3_in.transpose(1, 0, 2)                  # (N, NC, F)
        f3 = self.t3(t3_tokens.astype(self.dtype)).transpose(1, 0, 2)
        t3_w = jax.nn.softmax(self.t3_attn(f3).astype(jnp.float32), axis=0)
        f3 = jnp.sum(f3 * t3_w.astype(f3.dtype), axis=0)      # (N, F)

        rgb = self.color_layer(f3)
        if cfg.out_sigmoid:
            rgb = jax.nn.sigmoid(rgb)
        return rgb.astype(jnp.float32), f3.astype(jnp.float32)


def batched_forward(apply_fn, origins, directions, lengths, n_batches: int):
    """Chunked ray evaluation via lax.map (replaces ``eft.py:470-505``).

    Args:
        apply_fn: (origins (n,3), dirs (n,3), lengths (n,D)) -> (rgb, feat).
        origins/directions: (..., 3); lengths: (..., D).
        n_batches: number of equal chunks (total rays must divide evenly;
            callers pad if needed).

    Returns:
        rgb (..., 3), features (..., F).
    """
    spatial = origins.shape[:-1]
    D = lengths.shape[-1]
    total = 1
    for s in spatial:
        total *= s
    assert total % n_batches == 0, (total, n_batches)
    chunk = total // n_batches
    o = origins.reshape(n_batches, chunk, 3)
    d = directions.reshape(n_batches, chunk, 3)
    l = lengths.reshape(n_batches, chunk, D)
    rgb, feat = jax.lax.map(lambda args: apply_fn(*args), (o, d, l))
    return (rgb.reshape(*spatial, -1), feat.reshape(*spatial, -1))
