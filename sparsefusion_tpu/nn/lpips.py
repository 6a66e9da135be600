"""LPIPS (VGG16) perceptual distance in Flax.

Replaces the ``lpips`` package the reference uses for the fusion-loss
perceptual term and eval metrics (``external/external_utils.py:11-49``,
``utils/common_utils.py:44-64``): VGG16 features at
relu1_2/relu2_2/relu3_3/relu4_3/relu5_3, channel-unit-normalized, squared
differences passed through learned non-negative 1x1 "lin" heads, spatial
mean, summed over layers.

Pretrained torchvision VGG16 + lpips lin weights convert via
``convert_lpips_weights``; without them the module still runs (random
features) but callers should gate on ``weights is not None`` — the
distillation loop skips the perceptual term when no weights are supplied,
matching the reference's behavior before ``start_percep_step``.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# torchvision VGG16 conv layer channel plan per stage
_VGG_PLAN = ((64, 64), (128, 128), (256, 256, 256), (512, 512, 512),
             (512, 512, 512))

# lpips input scaling (lpips/lpips.py ScalingLayer constants)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 conv trunk returning the 5 relu stage outputs (NHWC)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        feats = []
        conv_idx = 0
        for stage, widths in enumerate(_VGG_PLAN):
            for w in widths:
                x = nn.Conv(w, (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv_{conv_idx}")(x)
                x = jax.nn.relu(x)
                conv_idx += 1
            feats.append(x)
            if stage < len(_VGG_PLAN) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


class LPIPS(nn.Module):
    """lpips.LPIPS(net='vgg') equivalent: distance between two images."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img0, img1, normalize: bool = False) -> jnp.ndarray:
        """img0/img1: (B, H, W, 3); in [0,1] if normalize else [-1,1]."""
        if normalize:
            img0 = 2 * img0 - 1
            img1 = 2 * img1 - 1
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        vgg = VGG16Features(dtype=self.dtype, name="vgg")
        f0 = vgg((img0 - shift) / scale)
        f1 = vgg((img1 - shift) / scale)

        total = 0.0
        for i, (a, b) in enumerate(zip(f0, f1)):
            a = a / jnp.maximum(
                jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
            b = b / jnp.maximum(
                jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
            diff = (a - b) ** 2
            w = nn.Dense(1, use_bias=False, dtype=self.dtype,
                         name=f"lin_{i}")(diff)
            total = total + jnp.mean(w, axis=(1, 2, 3))
        return total


def convert_lpips_weights(vgg_state_dict: Dict,
                          lpips_state_dict: Dict) -> Dict:
    """(torchvision vgg16 'features.*', lpips 'lin{i}.model.1.weight')
    -> flax LPIPS params."""
    from sparsefusion_tpu.train.convert import conv1x1_as_dense, conv_kernel, t2np

    params: Dict = {"vgg": {}}
    # torchvision vgg16.features conv indices
    torch_conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    for my_idx, t_idx in enumerate(torch_conv_idx):
        params["vgg"][f"conv_{my_idx}"] = {
            "kernel": conv_kernel(vgg_state_dict[f"features.{t_idx}.weight"]),
            "bias": t2np(vgg_state_dict[f"features.{t_idx}.bias"]),
        }
    for i in range(5):
        w = lpips_state_dict[f"lin{i}.model.1.weight"]
        params[f"lin_{i}"] = {"kernel": conv1x1_as_dense(w)}
    return params


def load_lpips(weights_path: Optional[str] = None):
    """Returns (module, params) or (module, None) when no weights exist."""
    model = LPIPS()
    if weights_path is None:
        return model, None
    import os

    if not os.path.exists(weights_path):
        return model, None
    data = np.load(weights_path, allow_pickle=True)
    if "params" in data and data["params"].dtype == object:
        params = data["params"].item()
    else:
        # flat 'a/b/c' keys (tools/convert_weights.py format)
        from sparsefusion_tpu.train.checkpoints import load_npz_pytree

        params = load_npz_pytree(weights_path)
    return model, params


def build_lpips_fn(spec: Optional[str]):
    """CLI entry: build ``lpips_fn(img0_01, img1_01) -> (B,)`` from either
    a converted .npz (``load_lpips``) or a 'vgg16.pth,lpips_vgg.pth' pair
    of torch checkpoints.  Returns None when weights are unavailable —
    callers then skip the perceptual term, matching the reference when
    lpips isn't installed."""
    if not spec:
        return None
    import os

    if "," in spec:
        vgg_path, lin_path = (s.strip() for s in spec.split(",", 1))
        if not (os.path.exists(vgg_path) and os.path.exists(lin_path)):
            print(f"WARNING: lpips weights not found ({spec}); "
                  "perceptual loss disabled")
            return None
        import torch

        vgg_sd = torch.load(vgg_path, map_location="cpu", weights_only=False)
        if hasattr(vgg_sd, "state_dict"):
            vgg_sd = vgg_sd.state_dict()
        lin_sd = torch.load(lin_path, map_location="cpu", weights_only=False)
        if "state_dict" in lin_sd:
            lin_sd = lin_sd["state_dict"]
        params = convert_lpips_weights(vgg_sd, lin_sd)
        model = LPIPS()
    else:
        model, params = load_lpips(spec)
        if params is None:
            print(f"WARNING: lpips weights not found ({spec}); "
                  "perceptual loss disabled")
            return None
    params = jax.tree_util.tree_map(jnp.asarray, params)

    def lpips_fn(img0, img1):
        return model.apply({"params": params}, img0, img1, normalize=True)

    return lpips_fn
