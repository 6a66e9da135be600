"""Tests for metrics, the data contract, and the synthetic scene."""
import numpy as np
import pytest

from sparsefusion_tpu.data.contract import SceneData
from sparsefusion_tpu.data.synthetic import make_synthetic_scene
from sparsefusion_tpu.utils.metrics import psnr, ssim
from sparsefusion_tpu.utils.image import huber, split_list


def test_psnr():
    a = np.zeros((8, 8, 3))
    b = np.full((8, 8, 3), 0.1)
    np.testing.assert_allclose(psnr(a, b), 20.0, atol=1e-6)
    assert psnr(a, a) == float("inf")


def test_ssim_identity_and_degradation(rng):
    img = rng.rand(32, 32, 3)
    assert ssim(img, img) == pytest.approx(1.0)
    noisy = img + rng.randn(32, 32, 3) * 0.2
    s = ssim(img, np.clip(noisy, 0, 1))
    assert 0.0 < s < 0.9


def test_ssim_against_reference_values(rng):
    # constant-offset images: SSIM formula reduces to luminance term only
    a = np.full((32, 32), 0.4)
    b = np.full((32, 32), 0.6)
    c1 = 0.01 ** 2
    expected = (2 * 0.4 * 0.6 + c1) / (0.4 ** 2 + 0.6 ** 2 + c1)
    assert ssim(a, b) == pytest.approx(expected, rel=1e-6)


def test_huber_and_split_list():
    import jax.numpy as jnp
    x = jnp.array([0.0, 1.0])
    y = jnp.array([0.0, 0.0])
    h = huber(x, y, scaling=0.1)
    assert float(h[0]) == pytest.approx(0.0, abs=1e-6)
    assert float(h[1]) == pytest.approx(0.1 * (np.sqrt(1 + 100) - 1),
                                        rel=1e-4)
    parts = split_list(list(range(10)), 3)
    assert [len(p) for p in parts] == [4, 3, 3]
    assert sum(parts, []) == list(range(10))


def test_synthetic_scene_contract():
    scene = make_synthetic_scene(n_views=4, image_size=32)
    assert scene.images.shape == (4, 32, 32, 3)
    assert scene.masks.shape == (4, 32, 32, 1)
    assert len(scene) == 4
    # object visible in every view
    assert scene.masks.reshape(4, -1).max(axis=1).min() > 0.5
    cams = scene.cameras()
    assert len(cams) == 4
    # roundtrip through the reference dict contract
    d = scene.to_reference_dict()
    assert d["images"].shape == (4, 3, 32, 32)
    back = SceneData.from_reference_dict(d)
    np.testing.assert_allclose(back.images, scene.images)
    np.testing.assert_allclose(back.R, scene.R)


def test_synthetic_scene_multiview_consistency():
    """Centered object: blob cluster should appear near image center."""
    scene = make_synthetic_scene(n_views=6, image_size=32, seed=1)
    for i in range(6):
        m = scene.masks[i, :, :, 0]
        ys, xs = np.nonzero(m > 0.3)
        assert len(ys) > 10
        assert 6 < ys.mean() < 26 and 6 < xs.mean() < 26
