"""tools/convert_weights.py: flat-npz pytree roundtrip + CLI conversion
of a fabricated resnet18 checkpoint, loaded back through the model path."""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from convert_weights import (  # noqa: E402
    flatten_pytree,
    save_npz_pytree,
    unflatten_pytree,
)

from sparsefusion_tpu.train.checkpoints import load_npz_pytree  # noqa: E402


def test_flat_npz_roundtrip(tmp_path, rng):
    tree = {
        "a": {"b": rng.randn(3, 4).astype(np.float32),
              "c": {"d": rng.randn(2).astype(np.float32)}},
        "e": np.int32(7) * np.ones((5,), np.int32),
    }
    assert unflatten_pytree(flatten_pytree(tree)).keys() == tree.keys()
    path = tmp_path / "t.npz"
    save_npz_pytree(str(path), tree)
    back = load_npz_pytree(str(path))
    np.testing.assert_array_equal(back["a"]["b"], tree["a"]["b"])
    np.testing.assert_array_equal(back["a"]["c"]["d"], tree["a"]["c"]["d"])
    np.testing.assert_array_equal(back["e"], tree["e"])


def _fake_resnet18_sd(rng):
    """Minimal torchvision-layout resnet18 state dict (conv1..layer3)."""
    import torch

    sd = {}

    def bn(name, c):
        sd[f"{name}.weight"] = torch.from_numpy(
            rng.randn(c).astype(np.float32))
        sd[f"{name}.bias"] = torch.from_numpy(
            rng.randn(c).astype(np.float32))
        sd[f"{name}.running_mean"] = torch.zeros(c)
        sd[f"{name}.running_var"] = torch.ones(c)

    sd["conv1.weight"] = torch.from_numpy(
        rng.randn(64, 3, 7, 7).astype(np.float32))
    bn("bn1", 64)
    chans = {1: (64, 64), 2: (64, 128), 3: (128, 256), 4: (256, 512)}
    for layer in (1, 2, 3, 4):
        cin, cout = chans[layer]
        for blk in (0, 1):
            c0 = cin if blk == 0 else cout
            pre = f"layer{layer}.{blk}"
            sd[f"{pre}.conv1.weight"] = torch.from_numpy(
                rng.randn(cout, c0, 3, 3).astype(np.float32))
            bn(f"{pre}.bn1", cout)
            sd[f"{pre}.conv2.weight"] = torch.from_numpy(
                rng.randn(cout, cout, 3, 3).astype(np.float32))
            bn(f"{pre}.bn2", cout)
            if blk == 0 and layer > 1:
                sd[f"{pre}.downsample.0.weight"] = torch.from_numpy(
                    rng.randn(cout, c0, 1, 1).astype(np.float32))
                bn(f"{pre}.downsample.1", cout)
    return sd


@pytest.mark.slow
def test_cli_converts_resnet18_and_model_loads(tmp_path, rng):
    torch = pytest.importorskip("torch")
    sd = _fake_resnet18_sd(rng)
    pth = tmp_path / "resnet18.pth"
    torch.save(sd, str(pth))

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "convert_weights.py"),
         "--out-dir", str(tmp_path), "--resnet18", str(pth)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    npz = tmp_path / "resnet18.npz"
    assert npz.exists()

    # npz path loads into the EFT trunk exactly like the torch path
    from sparsefusion_tpu.train.checkpoints import import_resnet18_trunk
    from tests.test_distillation import tiny_models

    m_pt = import_resnet18_trunk(tiny_models(), str(pth), verbose=False)
    m_npz = import_resnet18_trunk(tiny_models(), str(npz), verbose=False)
    a = m_pt.eft_vars["params"]["encoder_model"]
    b = m_npz.eft_vars["params"]["encoder_model"]
    flat_a, flat_b = flatten_pytree(a), flatten_pytree(b)
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k])
