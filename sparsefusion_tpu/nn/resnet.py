"""ResNet18 multi-scale feature trunk in Flax (NHWC).

Replaces the torchvision resnet18 the EFT uses as its image encoder
(``sparsefusion/eft.py:96-110``, feature pyramid assembled at
``eft.py:176-206``): conv1/bn/relu, layer1-3 (layer4 unused), with the four
intermediate activations bilinearly upsampled (align_corners=True) to the
conv1 resolution and concatenated -> 64+64+128+256 = 512 channels at H/2.

Pretrained torchvision weights convert via ``train/convert.py``; from-
scratch init works for training.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from sparsefusion_tpu.ops.image import resize_bilinear


class BasicBlock(nn.Module):
    channels: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name=name)
        identity = x
        out = nn.Conv(self.channels, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = bn("bn1")(out)
        out = jax.nn.relu(out)
        out = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = bn("bn2")(out)
        if self.stride != 1 or x.shape[-1] != self.channels:
            identity = nn.Conv(self.channels, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = bn("downsample_bn")(identity)
        return jax.nn.relu(out + identity)


class ResNet18Features(nn.Module):
    """Returns the concatenated 512-ch feature pyramid at H/2 resolution."""

    in_dim: int = 3
    num_layers: int = 4  # how many pyramid stages (conv1 + layer1..3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name=name)
        h = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        h = bn("bn1")(h)
        h = jax.nn.relu(h)
        latents = [h]
        if self.num_layers > 1:
            # torch maxpool 3x3 stride 2 pad 1
            h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)),
                        constant_values=-jnp.inf)
            h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="VALID")
            h = BasicBlock(64, dtype=self.dtype, name="layer1_0")(h, train)
            h = BasicBlock(64, dtype=self.dtype, name="layer1_1")(h, train)
            latents.append(h)
        if self.num_layers > 2:
            h = BasicBlock(128, stride=2, dtype=self.dtype,
                           name="layer2_0")(h, train)
            h = BasicBlock(128, dtype=self.dtype, name="layer2_1")(h, train)
            latents.append(h)
        if self.num_layers > 3:
            h = BasicBlock(256, stride=2, dtype=self.dtype,
                           name="layer3_0")(h, train)
            h = BasicBlock(256, dtype=self.dtype, name="layer3_1")(h, train)
            latents.append(h)

        target_hw = latents[0].shape[1:3]
        ups = [latents[0]]
        for lat in latents[1:]:
            ups.append(resize_bilinear(lat, target_hw, align_corners=True))
        return jnp.concatenate(ups, axis=-1)
