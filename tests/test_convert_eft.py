"""EFT checkpoint converter: structural coverage + numerical spot checks."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from sparsefusion_tpu.core.cameras import Cameras
from sparsefusion_tpu.nn.eft import EFTConfig, EpipolarFeatureTransformer
from sparsefusion_tpu.train import convert as C


def synth_eft_state_dict(variables):
    """Inverse mapping: flax EFT vars -> torch-keyed state dict."""
    params = variables["params"]
    stats = variables["batch_stats"]
    sd = {}

    def put_dense(dst, tree):
        sd[f"{dst}.weight"] = torch.from_numpy(
            np.transpose(np.asarray(tree["kernel"]), (1, 0)).copy())
        if "bias" in tree:
            sd[f"{dst}.bias"] = torch.from_numpy(np.asarray(tree["bias"]))

    def put_conv(dst, tree):
        sd[f"{dst}.weight"] = torch.from_numpy(
            np.transpose(np.asarray(tree["kernel"]), (3, 2, 0, 1)).copy())

    def put_bn(dst, ptree, stree):
        sd[f"{dst}.weight"] = torch.from_numpy(np.asarray(ptree["scale"]))
        sd[f"{dst}.bias"] = torch.from_numpy(np.asarray(ptree["bias"]))
        sd[f"{dst}.running_mean"] = torch.from_numpy(np.asarray(stree["mean"]))
        sd[f"{dst}.running_var"] = torch.from_numpy(np.asarray(stree["var"]))

    def put_ln(dst, tree):
        sd[f"{dst}.weight"] = torch.from_numpy(np.asarray(tree["scale"]))
        sd[f"{dst}.bias"] = torch.from_numpy(np.asarray(tree["bias"]))

    # resnet trunk
    rp = params["encoder_model"]
    rs = stats["encoder_model"]
    put_conv("encoder_model.conv1", rp["conv1"])
    put_bn("encoder_model.bn1", rp["bn1"], rs["bn1"])
    for layer, blocks in (("layer1", 2), ("layer2", 2), ("layer3", 2)):
        for b in range(blocks):
            src = f"{layer}_{b}"
            dst = f"encoder_model.{layer}.{b}"
            put_conv(f"{dst}.conv1", rp[src]["conv1"])
            put_bn(f"{dst}.bn1", rp[src]["bn1"], rs[src]["bn1"])
            put_conv(f"{dst}.conv2", rp[src]["conv2"])
            put_bn(f"{dst}.bn2", rp[src]["bn2"], rs[src]["bn2"])
            if "downsample_conv" in rp[src]:
                put_conv(f"{dst}.downsample.0", rp[src]["downsample_conv"])
                put_bn(f"{dst}.downsample.1", rp[src]["downsample_bn"],
                       rs[src]["downsample_bn"])

    for t in ("t1", "t2", "t3"):
        put_dense(f"{t}.pre.0", params[t]["pre"])
        for i in range(4):
            lt = params[t][f"layer_{i}"]
            put_dense(f"{t}.encoder.layers.{i}.self_attn.in_proj",
                      lt["in_proj"])
            sd[f"{t}.encoder.layers.{i}.self_attn.in_proj_weight"] = \
                sd.pop(f"{t}.encoder.layers.{i}.self_attn.in_proj.weight")
            sd[f"{t}.encoder.layers.{i}.self_attn.in_proj_bias"] = \
                sd.pop(f"{t}.encoder.layers.{i}.self_attn.in_proj.bias")
            put_dense(f"{t}.encoder.layers.{i}.self_attn.out_proj",
                      lt["out_proj"])
            put_dense(f"{t}.encoder.layers.{i}.linear1", lt["linear1"])
            put_dense(f"{t}.encoder.layers.{i}.linear2", lt["linear2"])
            put_ln(f"{t}.encoder.layers.{i}.norm1", lt["norm1"])
            put_ln(f"{t}.encoder.layers.{i}.norm2", lt["norm2"])
    put_dense("t2_attn", params["t2_attn"])
    put_dense("t3_attn", params["t3_attn"])
    put_dense("color_layer.0", params["color_layer"])
    return sd


def test_eft_converter_full_roundtrip():
    model = EpipolarFeatureTransformer(EFTConfig())
    cams = Cameras.create(
        jnp.eye(3)[None], jnp.asarray([[0.0, 0, 3]]), jnp.ones((1, 2)),
        jnp.zeros((1, 2)), jnp.full((1, 2), 32.0))
    img = jnp.ones((1, 32, 32, 3)) * 0.3

    def run(m):
        latent = m.encode(img)
        return m(jnp.zeros((4, 3)), jnp.ones((4, 3)), jnp.ones((4, 2)),
                 cams, img, latent)

    variables = model.init(jax.random.PRNGKey(0), method=run)

    sd = synth_eft_state_dict(variables)
    converted = C.convert_eft_state_dict(sd)

    # full structural + value coverage of params and batch_stats
    for coll in ("params", "batch_stats"):
        want = jax.tree_util.tree_map(np.asarray, variables[coll])
        problems = C.validate_against(converted[coll], want)
        assert not problems, (coll, problems[:5])
        for a, b in zip(jax.tree_util.tree_leaves(converted[coll]),
                        jax.tree_util.tree_leaves(want)):
            np.testing.assert_allclose(a, b)

    # converted weights run identically
    out_a = model.apply(variables, method=run)
    out_b = model.apply(
        {"params": converted["params"],
         "batch_stats": converted["batch_stats"]}, method=run)
    np.testing.assert_allclose(np.asarray(out_a[0]), np.asarray(out_b[0]),
                               atol=1e-6)
