"""Golden full-forward parity of the EFT vs the ACTUAL reference eft.py.

The reference module (``/root/reference/sparsefusion/eft.py``) imports
pytorch3d and torchvision, which are absent here.  Per the round-2
verdict, we stub exactly the touched surface with torch
re-implementations:

* ``pytorch3d.renderer.RayBundle`` / ``ray_bundle_to_ray_points`` — a
  NamedTuple and the one-line lift ``o + l * d``,
* ``PerspectiveCameras.transform_points_ndc`` / ``get_camera_center`` —
  the same row-vector NDC conventions as ``core/cameras.py`` (which are
  themselves validated against PyTorch3D semantics in
  ``tests/test_cameras.py``),
* ``torchvision.models.resnet18`` — a faithful torch re-implementation
  of the torchvision layout (module names match, so the REAL reference
  ``encode`` path and our converter both consume its state dict).

This retires the last unproven forward in the pipeline: the assembled
T1 -> T2 -> T3 epipolar forward (``eft.py:356-453``) now has a numeric
gate against the reference's own code, not a fabricated state dict.
"""
from __future__ import annotations

import os
import sys
import types
from typing import NamedTuple

import numpy as np
import pytest

torch = pytest.importorskip("torch")
tnn = torch.nn

REF = "/root/reference"
if not os.path.isdir(REF):  # pragma: no cover
    pytest.skip("reference repo not mounted", allow_module_level=True)


# ---------------------------------------------------------------------------
# torchvision stub: resnet18 with torchvision's exact module layout
# ---------------------------------------------------------------------------

class _BasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.relu = tnn.ReLU(inplace=True)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return self.relu(out + idt)


class _ResNet18(tnn.Module):
    """torchvision.models.resnet18 layout (state-dict compatible)."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = tnn.Sequential(_BasicBlock(64, 64),
                                     _BasicBlock(64, 64))
        self.layer2 = tnn.Sequential(_BasicBlock(64, 128, 2),
                                     _BasicBlock(128, 128))
        self.layer3 = tnn.Sequential(_BasicBlock(128, 256, 2),
                                     _BasicBlock(256, 256))
        self.layer4 = tnn.Sequential(_BasicBlock(256, 512, 2),
                                     _BasicBlock(512, 512))
        self.avgpool = tnn.AdaptiveAvgPool2d((1, 1))
        self.fc = tnn.Linear(512, 1000)


def _install_stubs():
    if "torchvision" not in sys.modules or not hasattr(
            sys.modules["torchvision"], "models"):
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        tvm.resnet18 = lambda pretrained=False, **kw: _ResNet18()
        tvt = types.ModuleType("torchvision.transforms")
        tv.models = tvm
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
        sys.modules["torchvision.transforms"] = tvt
    else:  # extend the minimal stub test_parity_ref may have installed
        tvm = types.ModuleType("torchvision.models")
        tvm.resnet18 = lambda pretrained=False, **kw: _ResNet18()
        sys.modules["torchvision"].models = tvm
        sys.modules["torchvision.models"] = tvm

    # lpips / skimage are imported at utils/common_utils.py module level
    # but unused by HarmonicEmbedding (the only symbol eft.py pulls)
    sys.modules.setdefault("lpips", types.ModuleType("lpips"))
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        skm = types.ModuleType("skimage.metrics")
        sk.metrics = skm
        sys.modules["skimage"] = sk
        sys.modules["skimage.metrics"] = skm

    # ---- pytorch3d stub: exactly the surface eft.py touches -------------
    class RayBundle(NamedTuple):
        origins: torch.Tensor
        directions: torch.Tensor
        lengths: torch.Tensor
        xys: torch.Tensor

    def ray_bundle_to_ray_points(rb):
        return rb.origins[..., None, :] \
            + rb.lengths[..., :, None] * rb.directions[..., None, :]

    class PerspectiveCameras:
        """Row-vector convention: x_view = x_world @ R + T (matching
        ``core/cameras.py:86-148``, validated by tests/test_cameras.py)."""

        def __init__(self, focal_length, principal_point, R, T):
            self.focal_length = focal_length  # (N, 2)
            self.principal_point = principal_point
            self.R = R                        # (N, 3, 3)
            self.T = T                        # (N, 3)

        def __len__(self):
            return self.R.shape[0]

        def transform_points_ndc(self, points, eps=1e-8):
            # points (1, P, 3) or (N, P, 3); square images -> no
            # aspect-ratio NDC rescale
            xv = torch.einsum("mpj,njk->npk", points, self.R) \
                + self.T[:, None, :]
            z = xv[..., 2:3]
            z = torch.where(z.abs() < eps,
                            torch.full_like(z, eps) * torch.sign(z + eps),
                            z)
            xy = self.focal_length[:, None, :] * xv[..., :2] / z \
                + self.principal_point[:, None, :]
            return torch.cat([xy, 1.0 / z], dim=-1)

        def get_camera_center(self):
            return -torch.einsum("ni,nji->nj", self.T, self.R)

    p3d = types.ModuleType("pytorch3d")
    p3d_r = types.ModuleType("pytorch3d.renderer")
    p3d_rc = types.ModuleType("pytorch3d.renderer.cameras")
    p3d_ri = types.ModuleType("pytorch3d.renderer.implicit")
    p3d_riu = types.ModuleType("pytorch3d.renderer.implicit.utils")
    p3d_r.RayBundle = RayBundle
    p3d_r.ray_bundle_to_ray_points = ray_bundle_to_ray_points
    p3d_rc.PerspectiveCameras = PerspectiveCameras
    p3d_riu._validate_ray_bundle_variables = lambda *a, **k: None
    p3d_riu.ray_bundle_variables_to_ray_points = \
        lambda o, d, l: o[..., None, :] + l[..., :, None] * d[..., None, :]
    p3d.renderer = p3d_r
    p3d_r.cameras = p3d_rc
    p3d_r.implicit = p3d_ri
    p3d_ri.utils = p3d_riu
    for name, mod in (("pytorch3d", p3d), ("pytorch3d.renderer", p3d_r),
                      ("pytorch3d.renderer.cameras", p3d_rc),
                      ("pytorch3d.renderer.implicit", p3d_ri),
                      ("pytorch3d.renderer.implicit.utils", p3d_riu)):
        sys.modules[name] = mod
    return RayBundle, PerspectiveCameras


RayBundle, StubCameras = _install_stubs()
if REF not in sys.path:
    sys.path.insert(0, REF)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sparsefusion.eft import EpipolarFeatureTransformer as RefEFT  # noqa
from sparsefusion_tpu.core.cameras import Cameras  # noqa: E402
from sparsefusion_tpu.nn.eft import (  # noqa: E402
    EFTConfig,
    EpipolarFeatureTransformer,
)
from sparsefusion_tpu.train.convert import convert_eft_state_dict  # noqa


@pytest.fixture(scope="module")
def golden_pair():
    torch.manual_seed(31)
    ref = RefEFT(use_r=True, encoder="resnet18", return_features=True,
                 remove_unused_layers=False, verbose=False).eval()
    # randomize BN running stats so eval-mode normalization is non-trivial
    gen = torch.Generator().manual_seed(5)
    for m in ref.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.3, 0.3, generator=gen)
            m.running_var.uniform_(0.5, 1.5, generator=gen)

    variables = convert_eft_state_dict(ref.state_dict())
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    mine = EpipolarFeatureTransformer(EFTConfig())
    return ref, mine, variables


@pytest.mark.slow
def test_eft_full_forward_golden(golden_pair):
    """T1->T2->T3 epipolar forward vs the real reference eft.py."""
    ref, mine, variables = golden_pair
    rng = np.random.RandomState(42)
    NC, H, N, D = 2, 64, 6, 4

    # context cameras looking roughly at the origin from z ~ 3
    Rs = []
    for _ in range(NC):
        q, _ = np.linalg.qr(rng.randn(3, 3))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        Rs.append(q)
    R = np.stack(Rs).astype(np.float32)
    T = (rng.randn(NC, 3) * 0.2 + np.array([0, 0, 3.0])).astype(np.float32)
    f = rng.uniform(1.5, 3.0, (NC, 2)).astype(np.float32)
    c = rng.uniform(-0.1, 0.1, (NC, 2)).astype(np.float32)
    size = np.tile(np.array([H, H], np.float32), (NC, 1))

    images = rng.uniform(0, 1, (NC, H, H, 3)).astype(np.float32)

    origins = (rng.randn(N, 3) * 0.3 + np.array([0, 0, -2.0])) \
        .astype(np.float32)
    directions = (rng.randn(N, 3) * 0.1 + np.array([0, 0, 1.0])) \
        .astype(np.float32)
    lengths = np.sort(rng.uniform(1.0, 5.0, (N, D)).astype(np.float32),
                      axis=-1)

    # ---- reference forward ------------------------------------------------
    stub_cams = StubCameras(torch.from_numpy(f), torch.from_numpy(c),
                            torch.from_numpy(R), torch.from_numpy(T))
    imgs_t = torch.from_numpy(np.transpose(images, (0, 3, 1, 2)).copy())
    with torch.no_grad():
        ref.encode(stub_cams, imgs_t)
        rb = RayBundle(torch.from_numpy(origins),
                       torch.from_numpy(directions),
                       torch.from_numpy(lengths),
                       torch.zeros(N, 2))
        ref_rgb, ref_feat, _ = ref(rb)

    # ---- ours -------------------------------------------------------------
    cams = Cameras.create(R, T, f, c, size)
    latent = mine.apply(variables, jnp.asarray(images),
                        method=EpipolarFeatureTransformer.encode)
    my_rgb, my_feat = mine.apply(
        variables, jnp.asarray(origins), jnp.asarray(directions),
        jnp.asarray(lengths), cams, jnp.asarray(images), latent)

    np.testing.assert_allclose(np.asarray(my_rgb), ref_rgb.numpy(),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(my_feat), ref_feat.numpy(),
                               atol=2e-3, rtol=1e-2)


@pytest.mark.slow
def test_eft_encode_latent_golden(golden_pair):
    """ResNet18 pyramid encode parity (conv1..layer3, bilinear upsample
    align_corners=True concat — ``eft.py:155-206``)."""
    ref, mine, variables = golden_pair
    rng = np.random.RandomState(43)
    images = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    imgs_t = torch.from_numpy(np.transpose(images, (0, 3, 1, 2)).copy())
    with torch.no_grad():
        _, ref_latent = ref.encode(None, imgs_t)
    my_latent = mine.apply(variables, jnp.asarray(images),
                           method=EpipolarFeatureTransformer.encode)
    np.testing.assert_allclose(
        np.transpose(np.asarray(my_latent), (0, 3, 1, 2)),
        ref_latent.numpy(), atol=2e-4, rtol=1e-3)
