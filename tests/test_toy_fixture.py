"""tools/make_toy_fixture.py: deterministic co3d_toy-format fixture."""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from sparsefusion_tpu.data.co3d_toy import CO3DToyDataset  # noqa: E402


def _build(root, size=32, views=4, scenes=2, cats=("hydrant",)):
    from tools.make_toy_fixture import main

    argv = sys.argv
    sys.argv = ["make_toy_fixture", "--root", str(root),
                "--categories", *cats, "--scenes", str(scenes),
                "--views", str(views), "--size", str(size)]
    try:
        main()
    finally:
        sys.argv = argv


def test_fixture_roundtrips_through_toy_loader(tmp_path):
    _build(tmp_path / "a")
    ds = CO3DToyDataset(str(tmp_path / "a"), "hydrant")
    assert len(ds) == 2
    scene = ds[0]
    assert scene.images.shape == (4, 32, 32, 3)
    assert scene.R.shape == (4, 3, 3)
    assert scene.f.shape == (4, 2)
    assert scene.masks is not None
    assert np.all(np.isfinite(scene.images))
    assert scene.images.min() >= 0.0 and scene.images.max() <= 1.0

    # raw pickle follows the reference toy contract exactly
    # (utils/co3d_toy_dataloader.py:9-30 + README.md:111-122)
    d = torch.load(tmp_path / "a" / "hydrant" / "hydrant_toy.pt",
                   map_location="cpu", weights_only=False)
    assert set(d.keys()) == {"hydrant"}
    s0 = d["hydrant"][0]
    assert s0["images"].shape == (4, 3, 32, 32)   # torch NCHW
    for k in ("R", "T", "f", "c", "valid_region", "image_size"):
        assert k in s0, k


def test_fixture_is_deterministic(tmp_path):
    _build(tmp_path / "a")
    _build(tmp_path / "b")
    da = torch.load(tmp_path / "a" / "hydrant" / "hydrant_toy.pt",
                    map_location="cpu", weights_only=False)
    db = torch.load(tmp_path / "b" / "hydrant" / "hydrant_toy.pt",
                    map_location="cpu", weights_only=False)
    for sa, sb in zip(da["hydrant"], db["hydrant"]):
        np.testing.assert_array_equal(sa["images"].numpy(),
                                      sb["images"].numpy())
        np.testing.assert_array_equal(sa["R"].numpy(), sb["R"].numpy())
