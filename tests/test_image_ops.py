"""Parity tests of image ops against torch CPU (the reference's backend)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from sparsefusion_tpu.ops.image import (
    grid_sample_bilinear,
    resize_bilinear,
    resize_nearest,
)


@pytest.mark.parametrize("align", [True])
def test_grid_sample_matches_torch(rng, align):
    img = rng.rand(2, 5, 7, 3).astype(np.float32)
    coords = (rng.rand(2, 11, 2) * 2.4 - 1.2).astype(np.float32)  # incl. oob

    got = grid_sample_bilinear(jnp.asarray(img), jnp.asarray(coords),
                               align_corners=align)

    timg = torch.from_numpy(img).permute(0, 3, 1, 2)  # BCHW
    tgrid = torch.from_numpy(coords).unsqueeze(2)     # (B, N, 1, 2)
    ref = F.grid_sample(timg, tgrid, align_corners=align, mode="bilinear",
                        padding_mode="border")
    ref = ref[..., 0].permute(0, 2, 1).numpy()        # (B, N, C)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_grid_sample_negated_ndc_convention(rng):
    """EFT samples with -xy (eft.py:254): check it lands where expected."""
    img = np.zeros((1, 4, 4, 1), np.float32)
    img[0, 0, 3, 0] = 1.0  # top-right pixel (row 0, col 3)
    # NDC (+x left, +y up) => top-right pixel is x=-1, y=+1 in NDC;
    # grid_sample convention needs the negation: (x=+1, y=-1)
    coords = jnp.array([[[1.0, -1.0]]])
    out = grid_sample_bilinear(jnp.asarray(img), coords, align_corners=True)
    np.testing.assert_allclose(np.asarray(out), [[[1.0]]], atol=1e-6)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("out_hw", [(10, 14), (3, 4), (8, 8)])
def test_resize_bilinear_matches_torch(rng, align, out_hw):
    img = rng.rand(2, 8, 8, 3).astype(np.float32)
    got = resize_bilinear(jnp.asarray(img), out_hw, align_corners=align)
    timg = torch.from_numpy(img).permute(0, 3, 1, 2)
    ref = F.interpolate(timg, out_hw, mode="bilinear", align_corners=align)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


@pytest.mark.parametrize("out_hw", [(16, 16), (3, 5), (13, 2)])
def test_resize_nearest_matches_torch(rng, out_hw):
    img = rng.rand(1, 8, 6, 2).astype(np.float32)
    got = resize_nearest(jnp.asarray(img), out_hw)
    timg = torch.from_numpy(img).permute(0, 3, 1, 2)
    ref = F.interpolate(timg, out_hw, mode="nearest")
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-6)
