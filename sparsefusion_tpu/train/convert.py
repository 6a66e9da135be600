"""torch checkpoint -> Flax parameter conversion.

The reference distributes pretrained weights in three torch formats
(``utils/load_model.py:33-95,131-180``): EFT checkpoints (partial dict,
includes the torchvision resnet18 trunk), VLDM checkpoints (strict,
``unets.0.*`` imagen UNet), and the SD VAE (``first_stage_model.`` /
``model.`` key renames).  This module maps those state dicts onto the
Flax module trees defined in ``sparsefusion_tpu/nn`` so pretrained
reference weights run unchanged on TPU.

Conventions:
* torch Conv2d (O, I, kH, kW)  -> flax Conv kernel (kH, kW, I, O)
* torch Linear (O, I)          -> flax Dense kernel (I, O)
* torch LayerNorm weight/bias  -> flax LayerNorm scale/bias
* torch GroupNorm weight/bias  -> flax GroupNorm scale/bias
* torch BatchNorm              -> flax BatchNorm scale/bias + batch_stats
* imagen gamma-only LayerNorm g -> custom LayerNorm g
* ChanLayerNorm g (1, C, 1, 1)  -> custom LayerNorm g (C,)  (NHWC)
* 1x1 Conv2d used as projection -> Dense (squeeze spatial dims)
* MultiheadAttention in_proj_weight (3E, E) -> Dense kernel (E, 3E)

Each converter returns a nested dict matching the Flax tree; shapes are
validated against a reference tree when one is provided.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np


# --------------------------------------------------------------------------
# primitives
# --------------------------------------------------------------------------

def t2np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def conv_kernel(w) -> np.ndarray:
    return np.transpose(t2np(w), (2, 3, 1, 0))


def dense_kernel(w) -> np.ndarray:
    return np.transpose(t2np(w), (1, 0))


def conv1x1_as_conv(w) -> np.ndarray:
    return conv_kernel(w)


def conv1x1_as_dense(w) -> np.ndarray:
    """(O, I, 1, 1) -> (I, O)."""
    w = t2np(w)
    return np.transpose(w[:, :, 0, 0], (1, 0))


def _set(tree: Dict, path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


# --------------------------------------------------------------------------
# shared sub-module converters
# --------------------------------------------------------------------------

def _layernorm(out, dst, sd, src):
    _set(out, f"{dst}/scale", t2np(sd[f"{src}.weight"]))
    _set(out, f"{dst}/bias", t2np(sd[f"{src}.bias"]))


def _groupnorm(out, dst, sd, src):
    _set(out, f"{dst}/scale", t2np(sd[f"{src}.weight"]))
    _set(out, f"{dst}/bias", t2np(sd[f"{src}.bias"]))


def _conv(out, dst, sd, src, bias=True):
    _set(out, f"{dst}/kernel", conv_kernel(sd[f"{src}.weight"]))
    if bias and f"{src}.bias" in sd:
        _set(out, f"{dst}/bias", t2np(sd[f"{src}.bias"]))


def _dense(out, dst, sd, src, bias=True):
    _set(out, f"{dst}/kernel", dense_kernel(sd[f"{src}.weight"]))
    if bias and f"{src}.bias" in sd:
        _set(out, f"{dst}/bias", t2np(sd[f"{src}.bias"]))


def _dense_from_conv1x1(out, dst, sd, src, bias=True):
    _set(out, f"{dst}/kernel", conv1x1_as_dense(sd[f"{src}.weight"]))
    if bias and f"{src}.bias" in sd:
        _set(out, f"{dst}/bias", t2np(sd[f"{src}.bias"]))


def _gamma_ln(out, dst, sd, src):
    g = t2np(sd[f"{src}.g"])
    _set(out, f"{dst}/g", g.reshape(-1))


# --------------------------------------------------------------------------
# SD VAE
# --------------------------------------------------------------------------

def _vae_resblock(out, dst, sd, src):
    _groupnorm(out, f"{dst}/norm1", sd, f"{src}.norm1")
    _conv(out, f"{dst}/conv1", sd, f"{src}.conv1")
    _groupnorm(out, f"{dst}/norm2", sd, f"{src}.norm2")
    _conv(out, f"{dst}/conv2", sd, f"{src}.conv2")
    if f"{src}.nin_shortcut.weight" in sd:
        _conv(out, f"{dst}/nin_shortcut", sd, f"{src}.nin_shortcut")


def _vae_attn(out, dst, sd, src):
    _groupnorm(out, f"{dst}/norm", sd, f"{src}.norm")
    for name in ("q", "k", "v", "proj_out"):
        _conv(out, f"{dst}/{name}", sd, f"{src}.{name}")


def convert_vae_state_dict(sd: Dict, ch_mult=(1, 2, 4, 4),
                           num_res_blocks: int = 2) -> Dict:
    """Renamed SD state dict -> flax AutoencoderKL variables.

    Accepts keys already stripped of 'first_stage_model.'/'model.'
    prefixes (apply ``strip_sd_prefixes`` first for a raw ckpt).
    """
    out: Dict = {}
    n_res = len(ch_mult)
    # encoder
    _conv(out, "encoder/conv_in", sd, "encoder.conv_in")
    for i in range(n_res):
        for j in range(num_res_blocks):
            _vae_resblock(out, f"encoder/down_{i}_block_{j}", sd,
                          f"encoder.down.{i}.block.{j}")
        if i != n_res - 1:
            _conv(out, f"encoder/down_{i}_downsample", sd,
                  f"encoder.down.{i}.downsample.conv")
    _vae_resblock(out, "encoder/mid_block_1", sd, "encoder.mid.block_1")
    _vae_attn(out, "encoder/mid_attn_1", sd, "encoder.mid.attn_1")
    _vae_resblock(out, "encoder/mid_block_2", sd, "encoder.mid.block_2")
    _groupnorm(out, "encoder/norm_out", sd, "encoder.norm_out")
    _conv(out, "encoder/conv_out", sd, "encoder.conv_out")
    # decoder
    _conv(out, "decoder/conv_in", sd, "decoder.conv_in")
    _vae_resblock(out, "decoder/mid_block_1", sd, "decoder.mid.block_1")
    _vae_attn(out, "decoder/mid_attn_1", sd, "decoder.mid.attn_1")
    _vae_resblock(out, "decoder/mid_block_2", sd, "decoder.mid.block_2")
    for i in range(n_res):
        for j in range(num_res_blocks + 1):
            _vae_resblock(out, f"decoder/up_{i}_block_{j}", sd,
                          f"decoder.up.{i}.block.{j}")
        if i != 0:
            _conv(out, f"decoder/up_{i}_upsample", sd,
                  f"decoder.up.{i}.upsample.conv")
    _groupnorm(out, "decoder/norm_out", sd, "decoder.norm_out")
    _conv(out, "decoder/conv_out", sd, "decoder.conv_out")
    # quant convs
    _conv(out, "quant_conv", sd, "quant_conv")
    _conv(out, "post_quant_conv", sd, "post_quant_conv")
    return {"params": out}


def strip_sd_prefixes(sd: Dict) -> Dict:
    """``load_model.py:144-151`` key rename."""
    return {k.replace("first_stage_model.", "").replace("model.", ""): v
            for k, v in sd.items()}


# --------------------------------------------------------------------------
# imagen UNet
# --------------------------------------------------------------------------

def _imagen_attention(out, dst, sd, src, has_context: bool):
    _gamma_ln(out, f"{dst}/norm", sd, f"{src}.norm")
    _dense(out, f"{dst}/to_q", sd, f"{src}.to_q", bias=False)
    _dense(out, f"{dst}/to_kv", sd, f"{src}.to_kv", bias=False)
    _set(out, f"{dst}/null_kv", t2np(sd[f"{src}.null_kv"]))
    if has_context and f"{src}.to_context.0.weight" in sd:
        _layernorm(out, f"{dst}/context_norm", sd, f"{src}.to_context.0")
        _dense(out, f"{dst}/to_context", sd, f"{src}.to_context.1")
    _dense(out, f"{dst}/to_out", sd, f"{src}.to_out.0", bias=False)
    _gamma_ln(out, f"{dst}/out_norm", sd, f"{src}.to_out.1")


def _imagen_cross_attention(out, dst, sd, src):
    _gamma_ln(out, f"{dst}/norm", sd, f"{src}.norm")
    _dense(out, f"{dst}/to_q", sd, f"{src}.to_q", bias=False)
    _dense(out, f"{dst}/to_kv", sd, f"{src}.to_kv", bias=False)
    _set(out, f"{dst}/null_kv", t2np(sd[f"{src}.null_kv"]))
    _dense(out, f"{dst}/to_out", sd, f"{src}.to_out.0", bias=False)
    _gamma_ln(out, f"{dst}/out_norm", sd, f"{src}.to_out.1")


def _imagen_block(out, dst, sd, src):
    """imagen Block: groupnorm + project conv."""
    _groupnorm(out, f"{dst}/groupnorm", sd, f"{src}.groupnorm")
    _conv(out, f"{dst}/project", sd, f"{src}.project")


def _imagen_resblock(out, dst, sd, src):
    if f"{src}.time_mlp.1.weight" in sd:
        _dense(out, f"{dst}/time_mlp", sd, f"{src}.time_mlp.1")
    if f"{src}.cross_attn.fn.to_q.weight" in sd:
        _imagen_cross_attention(out, f"{dst}/cross_attn", sd,
                                f"{src}.cross_attn.fn")
    _imagen_block(out, f"{dst}/block1", sd, f"{src}.block1")
    _imagen_block(out, f"{dst}/block2", sd, f"{src}.block2")
    if f"{src}.gca.to_k.weight" in sd:
        _dense_from_conv1x1(out, f"{dst}/gca/to_k", sd, f"{src}.gca.to_k")
        _dense_from_conv1x1(out, f"{dst}/gca/net_in", sd, f"{src}.gca.net.0")
        _dense_from_conv1x1(out, f"{dst}/gca/net_out", sd,
                            f"{src}.gca.net.2")
    if f"{src}.res_conv.weight" in sd:
        _conv(out, f"{dst}/res_conv", sd, f"{src}.res_conv")


def _imagen_transformer_block(out, dst, sd, src, depth: int = 1):
    for i in range(depth):
        _imagen_attention(out, f"{dst}/attn_{i}", sd,
                          f"{src}.layers.{i}.0.fn", has_context=True)
        ff = f"{src}.layers.{i}.1"
        _gamma_ln(out, f"{dst}/ff_{i}/norm_in", sd, f"{ff}.0")
        _dense_from_conv1x1(out, f"{dst}/ff_{i}/in", sd, f"{ff}.1",
                            bias=False)
        _gamma_ln(out, f"{dst}/ff_{i}/norm_mid", sd, f"{ff}.3")
        _dense_from_conv1x1(out, f"{dst}/ff_{i}/out", sd, f"{ff}.4",
                            bias=False)


def convert_unet_state_dict(sd: Dict, num_levels: int = 4,
                            num_resnet_blocks=(2, 2, 2, 2),
                            layer_attns=(False, False, False, True),
                            prefix: str = "unets.0.") -> Dict:
    """VLDM checkpoint ``model_state_dict`` -> flax EfficientUNet params."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    out: Dict = {}

    # stem: CrossEmbedLayer convs
    i = 0
    while f"init_conv.convs.{i}.weight" in sd:
        _conv(out, f"init_conv/conv_{i}", sd, f"init_conv.convs.{i}")
        i += 1

    # time conditioning
    _set(out, "sinu_pos_emb/weights", t2np(sd["to_time_hiddens.0.weights"]))
    _dense(out, "to_time_hiddens", sd, "to_time_hiddens.1")
    _dense(out, "to_time_tokens", sd, "to_time_tokens.0")
    _dense(out, "to_time_cond", sd, "to_time_cond.0")
    _layernorm(out, "norm_cond", sd, "norm_cond")

    # down path
    for i in range(num_levels):
        _imagen_resblock(out, f"down_{i}_init", sd, f"downs.{i}.1")
        for j in range(num_resnet_blocks[i]):
            _imagen_resblock(out, f"down_{i}_res_{j}", sd,
                             f"downs.{i}.2.{j}")
        if layer_attns[i]:
            _imagen_transformer_block(out, f"down_{i}_attn", sd,
                                      f"downs.{i}.3")
        if f"downs.{i}.4.weight" in sd:  # Downsample conv
            _conv(out, f"down_{i}_ds/conv", sd, f"downs.{i}.4")
        else:  # Parallel(conv3, conv1) at the last level
            _conv(out, f"down_{i}_ds/conv3", sd, f"downs.{i}.4.fns.0")
            _conv(out, f"down_{i}_ds/conv1", sd, f"downs.{i}.4.fns.1")

    # middle
    _imagen_resblock(out, "mid_block1", sd, "mid_block1")
    if "mid_attn.fn.fn.to_q.weight" in sd:
        _imagen_attention(out, "mid_attn", sd, "mid_attn.fn.fn",
                          has_context=False)
    _imagen_resblock(out, "mid_block2", sd, "mid_block2")

    # up path
    rev_nrb = list(reversed(num_resnet_blocks))
    rev_attns = list(reversed(layer_attns))
    for i in range(num_levels):
        _imagen_resblock(out, f"up_{i}_init", sd, f"ups.{i}.0")
        for j in range(rev_nrb[i]):
            _imagen_resblock(out, f"up_{i}_res_{j}", sd, f"ups.{i}.1.{j}")
        if rev_attns[i]:
            _imagen_transformer_block(out, f"up_{i}_attn", sd, f"ups.{i}.2")
        if f"ups.{i}.3.net.0.weight" in sd:  # PixelShuffleUpsample
            _conv(out, f"up_{i}_us/conv", sd, f"ups.{i}.3.net.0")

    _imagen_resblock(out, "final_res_block", sd, "final_res_block")
    _conv(out, "final_conv", sd, "final_conv")
    return out


# --------------------------------------------------------------------------
# EFT (incl. torchvision resnet18 trunk)
# --------------------------------------------------------------------------

def _batchnorm(params, stats, dst, sd, src):
    _set(params, f"{dst}/scale", t2np(sd[f"{src}.weight"]))
    _set(params, f"{dst}/bias", t2np(sd[f"{src}.bias"]))
    _set(stats, f"{dst}/mean", t2np(sd[f"{src}.running_mean"]))
    _set(stats, f"{dst}/var", t2np(sd[f"{src}.running_var"]))


def convert_resnet18_trunk(sd: Dict, prefix: str = "encoder_model."):
    """torchvision resnet18 conv1..layer3 -> ResNet18Features variables."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    params: Dict = {}
    stats: Dict = {}
    _conv(params, "conv1", sd, "conv1", bias=False)
    _batchnorm(params, stats, "bn1", sd, "bn1")
    for layer, blocks in (("layer1", 2), ("layer2", 2), ("layer3", 2)):
        for b in range(blocks):
            dst = f"{layer}_{b}"
            src = f"{layer}.{b}"
            _conv(params, f"{dst}/conv1", sd, f"{src}.conv1", bias=False)
            _batchnorm(params, stats, f"{dst}/bn1", sd, f"{src}.bn1")
            _conv(params, f"{dst}/conv2", sd, f"{src}.conv2", bias=False)
            _batchnorm(params, stats, f"{dst}/bn2", sd, f"{src}.bn2")
            if f"{src}.downsample.0.weight" in sd:
                _conv(params, f"{dst}/downsample_conv", sd,
                      f"{src}.downsample.0", bias=False)
                _batchnorm(params, stats, f"{dst}/downsample_bn", sd,
                           f"{src}.downsample.1")
    return params, stats


def _torch_encoder_layer(params, dst, sd, src):
    _set(params, f"{dst}/in_proj/kernel",
         dense_kernel(sd[f"{src}.self_attn.in_proj_weight"]))
    _set(params, f"{dst}/in_proj/bias",
         t2np(sd[f"{src}.self_attn.in_proj_bias"]))
    _dense(params, f"{dst}/out_proj", sd, f"{src}.self_attn.out_proj")
    _dense(params, f"{dst}/linear1", sd, f"{src}.linear1")
    _dense(params, f"{dst}/linear2", sd, f"{src}.linear2")
    _layernorm(params, f"{dst}/norm1", sd, f"{src}.norm1")
    _layernorm(params, f"{dst}/norm2", sd, f"{src}.norm2")


def convert_eft_state_dict(sd: Dict, n_layers: int = 4) -> Dict:
    """EFT ``model_state_dict`` -> flax EpipolarFeatureTransformer vars."""
    params: Dict = {}
    stats: Dict = {}
    r_params, r_stats = convert_resnet18_trunk(sd)
    params["encoder_model"] = r_params
    stats["encoder_model"] = r_stats
    for t in ("t1", "t2", "t3"):
        _dense(params, f"{t}/pre", sd, f"{t}.pre.0")
        for i in range(n_layers):
            _torch_encoder_layer(params, f"{t}/layer_{i}", sd,
                                 f"{t}.encoder.layers.{i}")
    _dense(params, "t2_attn", sd, "t2_attn")
    _dense(params, "t3_attn", sd, "t3_attn")
    _dense(params, "color_layer", sd, "color_layer.0")
    return {"params": params, "batch_stats": stats}


# --------------------------------------------------------------------------
# top-level loaders
# --------------------------------------------------------------------------

def load_torch_state_dict(path: str, key: Optional[str] = "model_state_dict"):
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if key is not None and key in ckpt:
        ckpt = ckpt[key]
    elif "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return ckpt


def validate_against(tree: Dict, reference: Dict, path=()):
    """Assert converted tree covers the reference tree with equal shapes."""
    problems = []

    def walk(conv, ref, p):
        for k, v in ref.items():
            if isinstance(v, dict):
                walk(conv.get(k, {}), v, p + (k,))
            else:
                got = conv.get(k)
                if got is None:
                    problems.append(("missing", p + (k,), v.shape))
                elif tuple(got.shape) != tuple(v.shape):
                    problems.append(("shape", p + (k,), v.shape, got.shape))

    walk(tree, reference, path)
    return problems
