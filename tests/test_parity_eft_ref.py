"""Golden parity of the FULL EFT forward vs the ACTUAL reference module.

The reference ``sparsefusion/eft.py`` imports pytorch3d and torchvision,
neither of which is installed here.  This test stubs exactly the touched
surface:

* pytorch3d: ``RayBundle`` (a NamedTuple), ``ray_bundle_to_ray_points``
  (origins + directions * lengths), and ``PerspectiveCameras`` with the
  two methods the EFT calls — ``transform_points_ndc`` and
  ``get_camera_center`` (``eft.py:239, 316``).  The torch stubs implement
  the same math as ``core/cameras.py``, which is unit-tested on its own
  (tests/test_cameras.py); what THIS test proves is everything else: the
  resnet18 pyramid + its converter, epipolar grid_sample indexing,
  plucker/depth harmonic embeddings, the T1/T2/T3 token layouts,
  attention pooling, and the color head — against the real reference
  weights via ``convert_eft_state_dict``.
* torchvision: a faithful minimal ResNet-18 (torchvision BasicBlock
  topology and state-dict key naming) so the reference's
  ``encoder='resnet18'`` branch (``eft.py:95-108``) runs unmodified.

Reference call path covered: ``eft.py:356-467`` (forward incl. index(),
encode_plucker(), encode()) with ``return_features=True`` and the
``get_coarse_rgb`` head (``eft.py:340-355``) via return_intermediates.
"""
from __future__ import annotations

import os
import sys
import types
from typing import NamedTuple

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn

REF = "/root/reference"
if not os.path.isdir(REF):  # pragma: no cover
    pytest.skip("reference repo not mounted", allow_module_level=True)


# ---------------------------------------------------------------------------
# torchvision stub: minimal ResNet-18 with torchvision key naming
# ---------------------------------------------------------------------------
class _BasicBlock(nn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _ResNet18(nn.Module):
    """torchvision.models.resnet18 topology + state-dict key naming."""

    def __init__(self):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(64, 1)
        self.layer2 = self._make_layer(128, 2)
        self.layer3 = self._make_layer(256, 2)
        self.layer4 = self._make_layer(512, 2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512, 1000)

    def _make_layer(self, planes, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes))
        layers = [_BasicBlock(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes
        layers.append(_BasicBlock(planes, planes))
        return nn.Sequential(*layers)


def _resnet18_factory(pretrained=False, **kwargs):  # noqa: ARG001
    return _ResNet18()


def _install_stub(name: str) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    return mod


_tv = _install_stub("torchvision")
_tv.transforms = _install_stub("torchvision.transforms")
_tv.models = _install_stub("torchvision.models")
_tv.models.resnet18 = _resnet18_factory
_install_stub("lpips").LPIPS = object  # common_utils.py:5 (unused here)
_install_stub("skimage")
_install_stub("skimage.metrics")
sys.modules["skimage"].metrics = sys.modules["skimage.metrics"]


# ---------------------------------------------------------------------------
# pytorch3d stub: the three touched symbols, in torch
# ---------------------------------------------------------------------------
class _RayBundle(NamedTuple):
    origins: torch.Tensor
    directions: torch.Tensor
    lengths: torch.Tensor
    xys: torch.Tensor


def _ray_points(origins, directions, lengths):
    return origins[..., None, :] + directions[..., None, :] \
        * lengths[..., :, None]


def _ray_bundle_to_ray_points(rb):
    return _ray_points(rb.origins, rb.directions, rb.lengths)


class _PerspectiveCameras:
    """transform_points_ndc + get_camera_center in PyTorch3D's row-vector
    convention (x_view = x_world @ R + T; x_ndc = f*x/z + c; C = -T R^T),
    the same math as core/cameras.py (square images: NDC scale = 1)."""

    def __init__(self, R, T, focal_length, principal_point):
        self.R, self.T = R, T
        self.focal_length = focal_length
        self.principal_point = principal_point

    def __len__(self):
        return self.R.shape[0]

    def transform_points_ndc(self, points, eps: float = 1e-8):
        if points.dim() == 2:
            points = points[None]
        points = points.expand(len(self), -1, -1)
        xv = torch.einsum("npi,nij->npj", points, self.R) \
            + self.T[:, None, :]
        z = xv[..., 2:3]
        z = torch.where(z.abs() < eps,
                        torch.where(z >= 0, torch.full_like(z, eps),
                                    torch.full_like(z, -eps)), z)
        xy = self.focal_length[:, None, :] * xv[..., :2] / z \
            + self.principal_point[:, None, :]
        return torch.cat([xy, 1.0 / z], dim=-1)

    def get_camera_center(self):
        return -torch.einsum("ni,nji->nj", self.T, self.R)


_p3d = _install_stub("pytorch3d")
_p3d_r = _install_stub("pytorch3d.renderer")
_p3d_rc = _install_stub("pytorch3d.renderer.cameras")
_p3d_ri = _install_stub("pytorch3d.renderer.implicit")
_p3d_riu = _install_stub("pytorch3d.renderer.implicit.utils")
_p3d_r.RayBundle = _RayBundle
_p3d_r.ray_bundle_to_ray_points = _ray_bundle_to_ray_points
_p3d_rc.PerspectiveCameras = _PerspectiveCameras
_p3d_riu._validate_ray_bundle_variables = lambda *a, **k: None
_p3d_riu.ray_bundle_variables_to_ray_points = _ray_points
_p3d.renderer = _p3d_r
_p3d_r.cameras = _p3d_rc
_p3d_r.implicit = _p3d_ri
_p3d_ri.utils = _p3d_riu

if REF not in sys.path:
    sys.path.insert(0, REF)

import jax.numpy as jnp  # noqa: E402

from sparsefusion.eft import EpipolarFeatureTransformer as RefEFT  # noqa: E402

from sparsefusion_tpu.core.cameras import Cameras, get_camera_slice  # noqa: E402
from sparsefusion_tpu.data.synthetic import make_synthetic_scene  # noqa: E402
from sparsefusion_tpu.nn.eft import (  # noqa: E402
    EFTConfig,
    EpipolarFeatureTransformer,
)
from sparsefusion_tpu.train.convert import convert_eft_state_dict  # noqa: E402


@pytest.fixture(scope="module")
def eft_golden():
    torch.manual_seed(7)
    ref = RefEFT(use_r=True, encoder="resnet18", return_features=True,
                 remove_unused_layers=False)  # load_model.py:33 kwargs
    # non-trivial BN affines + running stats (torchvision init is
    # identity-affine, zero-mean/unit-var — too forgiving a golden)
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.weight.uniform_(0.5, 1.5)
                m.bias.normal_(0, 0.2)
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.7, 1.4)
    ref.eval()

    import jax

    variables = convert_eft_state_dict(
        {k: v for k, v in ref.state_dict().items()})
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    mine = EpipolarFeatureTransformer(EFTConfig())
    return ref, mine, variables


def _scene_geometry():
    """Shared geometry: 3 context views + query rays from view 0."""
    scene = make_synthetic_scene(n_views=4, image_size=64, seed=11)
    cams = scene.cameras()
    ctx = get_camera_slice(cams, [1, 2, 3])
    images = np.stack([np.asarray(scene.images[i]) for i in (1, 2, 3)])

    R = np.asarray(cams.R)
    T = np.asarray(cams.T)
    center0 = -(T[0] @ R[0].T)
    rng = np.random.RandomState(3)
    targets = rng.uniform(-0.3, 0.3, size=(8, 3)).astype(np.float32)
    dirs = targets - center0[None]
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = np.broadcast_to(center0, dirs.shape).astype(np.float32).copy()
    lengths = np.broadcast_to(
        np.linspace(1.2, 3.2, 6, dtype=np.float32), (8, 6)).copy()
    return ctx, images, origins, dirs, lengths


def test_eft_full_forward_parity(eft_golden):
    """T1->T2->T3 epipolar forward: rgb + 256-d features vs reference."""
    ref, mine, variables = eft_golden
    ctx, images, origins, dirs, lengths = _scene_geometry()

    # ---- reference (torch, stubbed pytorch3d) -------------------------
    t_cams = _PerspectiveCameras(
        R=torch.from_numpy(np.asarray(ctx.R)).float(),
        T=torch.from_numpy(np.asarray(ctx.T)).float(),
        focal_length=torch.from_numpy(np.asarray(ctx.focal_length)).float(),
        principal_point=torch.from_numpy(
            np.asarray(ctx.principal_point)).float())
    t_images = torch.from_numpy(images).permute(0, 3, 1, 2).contiguous()
    rb = _RayBundle(origins=torch.from_numpy(origins),
                    directions=torch.from_numpy(dirs),
                    lengths=torch.from_numpy(lengths),
                    xys=torch.zeros((origins.shape[0], 2)))
    with torch.no_grad():
        ref_rgb, ref_feat, _ = ref(rb, input_cameras=t_cams,
                                   input_rgb=t_images)

    # ---- mine (flax) ---------------------------------------------------
    j_images = jnp.asarray(images)
    latent = mine.apply(variables, j_images,
                        method=EpipolarFeatureTransformer.encode)
    my_rgb, my_feat = mine.apply(
        variables, jnp.asarray(origins), jnp.asarray(dirs),
        jnp.asarray(lengths), ctx, j_images, latent)

    np.testing.assert_allclose(np.asarray(my_rgb), ref_rgb.numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(my_feat), ref_feat.numpy(),
                               atol=5e-4, rtol=1e-3)


def test_eft_encoder_pyramid_parity(eft_golden):
    """ResNet18 multi-scale latent (conv1+layer1-3 pyramid, eft.py:155-206)
    through the real converter, NCHW vs NHWC."""
    ref, mine, variables = eft_golden
    _, images, *_ = _scene_geometry()
    t_images = torch.from_numpy(images).permute(0, 3, 1, 2).contiguous()
    with torch.no_grad():
        _, ref_latent = ref.encode(None, t_images)

    my_latent = mine.apply(variables, jnp.asarray(images),
                           method=EpipolarFeatureTransformer.encode)
    np.testing.assert_allclose(
        np.transpose(np.asarray(my_latent), (0, 3, 1, 2)),
        ref_latent.numpy(), atol=5e-4, rtol=1e-3)
