"""Weight-conversion parity tests against live torch modules.

torch (CPU) is available in the image, so the highest-risk conversions are
validated numerically: the EFT's torch TransformerEncoderLayer, the VAE
encoder blocks (conv transpose + groupnorm + asymmetric downsample +
single-head attention), and the resnet BasicBlock.
"""
import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from sparsefusion_tpu.nn.eft import TorchEncoderLayer
from sparsefusion_tpu.nn.resnet import BasicBlock
from sparsefusion_tpu.nn.vae import VAEAttnBlock, VAEResnetBlock
from sparsefusion_tpu.train import convert as C


def test_transformer_encoder_layer_parity(rng):
    d_model, ff = 16, 16
    torch.manual_seed(0)
    layer = tnn.TransformerEncoderLayer(d_model, 1, ff, dropout=0.0)
    layer.eval()
    sd = {f"l.{k}": v for k, v in layer.state_dict().items()}

    params = {}
    C._torch_encoder_layer(params, "layer", sd, "l")

    x = rng.randn(5, 7, d_model).astype(np.float32)  # (B, S, E)
    with torch.no_grad():
        # torch layer wants (S, B, E)
        ref = layer(torch.from_numpy(x).permute(1, 0, 2))
        ref = ref.permute(1, 0, 2).numpy()

    model = TorchEncoderLayer(d_model, ff)
    got = model.apply({"params": params["layer"]}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)


class TorchVAEResBlock(tnn.Module):
    """ldm ResnetBlock replica (test fixture for conversion parity)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = tnn.GroupNorm(32, cin, eps=1e-6)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = tnn.GroupNorm(32, cout, eps=1e-6)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.nin_shortcut = tnn.Conv2d(cin, cout, 1)

    def forward(self, x):
        h = self.norm1(x)
        h = h * torch.sigmoid(h)
        h = self.conv1(h)
        h = self.norm2(h)
        h = h * torch.sigmoid(h)
        h = self.conv2(h)
        sc = self.nin_shortcut(x) if hasattr(self, "nin_shortcut") else x
        return sc + h


def test_vae_resblock_parity(rng):
    torch.manual_seed(1)
    tb = TorchVAEResBlock(32, 64).eval()
    sd = {f"b.{k}": v for k, v in tb.state_dict().items()}
    out = {}
    C._vae_resblock(out, "b", sd, "b")

    x = rng.randn(2, 32, 8, 8).astype(np.float32)
    with torch.no_grad():
        ref = tb(torch.from_numpy(x)).permute(0, 2, 3, 1).numpy()

    model = VAEResnetBlock(64)
    got = model.apply({"params": out["b"]},
                      jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


class TorchVAEAttn(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = tnn.GroupNorm(32, c, eps=1e-6)
        self.q = tnn.Conv2d(c, c, 1)
        self.k = tnn.Conv2d(c, c, 1)
        self.v = tnn.Conv2d(c, c, 1)
        self.proj_out = tnn.Conv2d(c, c, 1)

    def forward(self, x):
        h = self.norm(x)
        q, k, v = self.q(h), self.k(h), self.v(h)
        b, c, hh, ww = q.shape
        q = q.reshape(b, c, hh * ww).permute(0, 2, 1)
        k = k.reshape(b, c, hh * ww)
        w = torch.bmm(q, k) * (c ** -0.5)
        w = torch.softmax(w, dim=2)
        v = v.reshape(b, c, hh * ww)
        h = torch.bmm(v, w.permute(0, 2, 1)).reshape(b, c, hh, ww)
        return x + self.proj_out(h)


def test_vae_attn_parity(rng):
    torch.manual_seed(2)
    tb = TorchVAEAttn(32).eval()
    sd = {f"a.{k}": v for k, v in tb.state_dict().items()}
    out = {}
    C._vae_attn(out, "a", sd, "a")
    x = rng.randn(1, 32, 6, 6).astype(np.float32)
    with torch.no_grad():
        ref = tb(torch.from_numpy(x)).permute(0, 2, 3, 1).numpy()
    got = VAEAttnBlock().apply({"params": out["a"]},
                               jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


class TorchBasicBlock(tnn.Module):
    """torchvision BasicBlock replica (stride-2 w/ downsample)."""

    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        h = torch.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        return torch.relu(h + idt)


def test_resnet_basic_block_parity(rng):
    torch.manual_seed(3)
    tb = TorchBasicBlock(16, 32, 2).eval()
    # randomize bn running stats so the test is not trivial
    for m in tb.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    sd = {f"layer2.0.{k.replace('downsample.0', 'downsample.0').replace('downsample.1', 'downsample.1')}": v
          for k, v in tb.state_dict().items()}
    params, stats = {}, {}
    C._conv(params, "b/conv1", sd, "layer2.0.conv1", bias=False)
    C._batchnorm(params, stats, "b/bn1", sd, "layer2.0.bn1")
    C._conv(params, "b/conv2", sd, "layer2.0.conv2", bias=False)
    C._batchnorm(params, stats, "b/bn2", sd, "layer2.0.bn2")
    C._conv(params, "b/downsample_conv", sd, "layer2.0.downsample.0",
            bias=False)
    C._batchnorm(params, stats, "b/downsample_bn", sd,
                 "layer2.0.downsample.1")

    x = rng.randn(1, 16, 8, 8).astype(np.float32)
    with torch.no_grad():
        ref = tb(torch.from_numpy(x)).permute(0, 2, 3, 1).numpy()
    model = BasicBlock(32, stride=2)
    got = model.apply({"params": params["b"], "batch_stats": stats["b"]},
                      jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                      train=False)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


def test_unet_converter_covers_flax_tree():
    """Structural check: synthesize a torch state dict via the inverse
    mapping of the flax tree, convert it, and require full coverage."""
    from sparsefusion_tpu.nn.unet import EfficientUNet, UNetConfig

    cfg = UNetConfig(dim=16, dim_mults=(1, 2), num_resnet_blocks=(1, 1),
                     layer_attns=(False, True),
                     layer_cross_attns=(False, False),
                     cond_images_channels=8, attn_heads=2, attn_dim_head=4)
    model = EfficientUNet(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                        jnp.zeros((1,)), jnp.zeros((1, 8, 8, 8)))["params"]

    sd = synth_unet_state_dict(params, cfg)
    conv = C.convert_unet_state_dict(
        sd, num_levels=2, num_resnet_blocks=cfg.num_resnet_blocks,
        layer_attns=cfg.layer_attns)
    params_np = jax.tree_util.tree_map(np.asarray, params)
    problems = C.validate_against(conv, params_np)
    assert not problems, problems[:10]
    # and values roundtrip exactly
    leaves_a = jax.tree_util.tree_leaves(conv)
    leaves_b = jax.tree_util.tree_leaves(params_np)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(a, b)


def synth_unet_state_dict(params, cfg):
    """Inverse of convert_unet_state_dict for test synthesis."""
    sd = {}

    def put_dense(dst, tree, bias=True):
        sd[f"unets.0.{dst}.weight"] = torch.from_numpy(
            np.transpose(np.asarray(tree["kernel"]), (1, 0)))
        if bias and "bias" in tree:
            sd[f"unets.0.{dst}.bias"] = torch.from_numpy(
                np.asarray(tree["bias"]))

    def put_conv(dst, tree):
        sd[f"unets.0.{dst}.weight"] = torch.from_numpy(
            np.transpose(np.asarray(tree["kernel"]), (3, 2, 0, 1)))
        if "bias" in tree:
            sd[f"unets.0.{dst}.bias"] = torch.from_numpy(
                np.asarray(tree["bias"]))

    def put_dense_as_conv1x1(dst, tree, bias=True):
        k = np.asarray(tree["kernel"])  # (I, O)
        sd[f"unets.0.{dst}.weight"] = torch.from_numpy(
            np.transpose(k, (1, 0))[:, :, None, None].copy())
        if bias and "bias" in tree:
            sd[f"unets.0.{dst}.bias"] = torch.from_numpy(
                np.asarray(tree["bias"]))

    def put_ln(dst, tree):
        sd[f"unets.0.{dst}.weight"] = torch.from_numpy(
            np.asarray(tree["scale"]))
        sd[f"unets.0.{dst}.bias"] = torch.from_numpy(np.asarray(tree["bias"]))

    def put_gln(dst, tree):
        sd[f"unets.0.{dst}.g"] = torch.from_numpy(np.asarray(tree["g"]))

    def put_gn(dst, tree):
        put_ln(dst, tree)

    def put_attn(dst, tree, ctx):
        put_gln(f"{dst}.norm", tree["norm"])
        put_dense(f"{dst}.to_q", tree["to_q"], bias=False)
        put_dense(f"{dst}.to_kv", tree["to_kv"], bias=False)
        sd[f"unets.0.{dst}.null_kv"] = torch.from_numpy(
            np.asarray(tree["null_kv"]))
        if ctx and "to_context" in tree:
            put_ln(f"{dst}.to_context.0", tree["context_norm"])
            put_dense(f"{dst}.to_context.1", tree["to_context"])
        put_dense(f"{dst}.to_out.0", tree["to_out"], bias=False)
        put_gln(f"{dst}.to_out.1", tree["out_norm"])

    def put_resblock(dst, tree):
        if "time_mlp" in tree:
            put_dense(f"{dst}.time_mlp.1", tree["time_mlp"])
        if "cross_attn" in tree:
            put_attn(f"{dst}.cross_attn.fn", tree["cross_attn"], ctx=False)
        for b in ("block1", "block2"):
            put_gn(f"{dst}.{b}.groupnorm", tree[b]["groupnorm"])
            put_conv(f"{dst}.{b}.project", tree[b]["project"])
        if "gca" in tree:
            put_dense_as_conv1x1(f"{dst}.gca.to_k", tree["gca"]["to_k"])
            put_dense_as_conv1x1(f"{dst}.gca.net.0", tree["gca"]["net_in"])
            put_dense_as_conv1x1(f"{dst}.gca.net.2", tree["gca"]["net_out"])
        if "res_conv" in tree:
            put_conv(f"{dst}.res_conv", tree["res_conv"])

    def put_transformer(dst, tree):
        i = 0
        while f"attn_{i}" in tree:
            put_attn(f"{dst}.layers.{i}.0.fn", tree[f"attn_{i}"], ctx=True)
            ff = tree[f"ff_{i}"]
            put_gln(f"{dst}.layers.{i}.1.0", ff["norm_in"])
            put_dense_as_conv1x1(f"{dst}.layers.{i}.1.1", ff["in"],
                                 bias=False)
            put_gln(f"{dst}.layers.{i}.1.3", ff["norm_mid"])
            put_dense_as_conv1x1(f"{dst}.layers.{i}.1.4", ff["out"],
                                 bias=False)
            i += 1

    i = 0
    while f"conv_{i}" in params["init_conv"]:
        put_conv(f"init_conv.convs.{i}", params["init_conv"][f"conv_{i}"])
        i += 1
    sd["unets.0.to_time_hiddens.0.weights"] = torch.from_numpy(
        np.asarray(params["sinu_pos_emb"]["weights"]))
    put_dense("to_time_hiddens.1", params["to_time_hiddens"])
    put_dense("to_time_tokens.0", params["to_time_tokens"])
    put_dense("to_time_cond.0", params["to_time_cond"])
    put_ln("norm_cond", params["norm_cond"])

    n_levels = len(cfg.dim_mults)
    for i in range(n_levels):
        put_resblock(f"downs.{i}.1", params[f"down_{i}_init"])
        for j in range(cfg.num_resnet_blocks[i]):
            put_resblock(f"downs.{i}.2.{j}", params[f"down_{i}_res_{j}"])
        if cfg.layer_attns[i]:
            put_transformer(f"downs.{i}.3", params[f"down_{i}_attn"])
        ds = params[f"down_{i}_ds"]
        if "conv" in ds:
            put_conv(f"downs.{i}.4", ds["conv"])
        else:
            put_conv(f"downs.{i}.4.fns.0", ds["conv3"])
            put_conv(f"downs.{i}.4.fns.1", ds["conv1"])

    put_resblock("mid_block1", params["mid_block1"])
    put_attn("mid_attn.fn.fn", params["mid_attn"], ctx=False)
    put_resblock("mid_block2", params["mid_block2"])

    rev_nrb = list(reversed(cfg.num_resnet_blocks))
    rev_attn = list(reversed(cfg.layer_attns))
    for i in range(n_levels):
        put_resblock(f"ups.{i}.0", params[f"up_{i}_init"])
        for j in range(rev_nrb[i]):
            put_resblock(f"ups.{i}.1.{j}", params[f"up_{i}_res_{j}"])
        if rev_attn[i]:
            put_transformer(f"ups.{i}.2", params[f"up_{i}_attn"])
        if f"up_{i}_us" in params:
            put_conv(f"ups.{i}.3.net.0", params[f"up_{i}_us"]["conv"])

    put_resblock("final_res_block", params["final_res_block"])
    put_conv("final_conv", params["final_conv"])
    return sd
