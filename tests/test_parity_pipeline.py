"""ASSEMBLED-pipeline golden vs the reference's own torch code.

Module-level parity (EFT, UNet, VAE, DDPM schedule, PLMS trajectory) is
proven in ``test_parity_ref.py`` / ``test_parity_eft_golden.py``; this
file retires the remaining unknown: the COMPOSED graph.  It runs
BASELINE config[0] — "EFT + PLMS VLDM sampling + VAE decode" novel-view
generation — end to end through BOTH implementations and asserts
image-level parity:

    context images + cameras
      -> EFT epipolar forward over a query camera's ray grid
         (``eft.py:356-453`` via the pytorch3d/torchvision stubs)
      -> 256-ch feature image fed as ``cond_images``
         (``imagen_pytorch.py:1496-1504``) + bilinear-upsampled EFT rgb
         (``distillation.py:92-141``)
      -> VAE encode of a render, x ``z_scale_factor``
         (``distillation.py:294-299``)
      -> PLMS partial/full denoise (``external/plms.py:20-213``,
         fusion semantics ``distillation.py:300-314``)
      -> VAE decode + unnormalize + clip -> fused target image
      -> fusion weight ``1 - alpha_cumprod``

Both sides share random-init state dicts (converted through
``train/convert.py``) and the same ray grid / seeds; posterior noise is
zeroed on both sides (the additive stochastic term is covered by the
schedule parity tests).  Topology is the 4-level mid-size SF shape
(UNet mults (1,2,4,4), blocks (2,2,2,2), top-level attn, 256-ch cond;
VAE ch_mult (1,2,4,4)) at reduced width so it runs on CPU.

Why not the released checkpoints / real CO3D: this environment has zero
network egress and no reference checkpoint files on disk, so true-weight
or real-data goldens are not runnable here — random-init parity over the
same composed graph is the strongest feasible equivalence proof (see
README "Parity vs the reference").
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if not os.path.isdir(REF):  # pragma: no cover
    pytest.skip("reference repo not mounted", allow_module_level=True)

# importing the golden module installs the pytorch3d/torchvision/lpips
# stubs and puts /root/reference on sys.path
from tests.test_parity_eft_golden import (  # noqa: E402
    RayBundle,
    StubCameras,
)

# pytorch_lightning / taming are imported by autoencoder.py for the
# unused VQModel only (SURVEY.md §2.3) — stub for AutoencoderKL
import types  # noqa: E402

if "pytorch_lightning" not in sys.modules:
    _pl = types.ModuleType("pytorch_lightning")
    _pl.LightningModule = torch.nn.Module
    sys.modules["pytorch_lightning"] = _pl
if "taming" not in sys.modules:
    for _name in ("taming", "taming.modules", "taming.modules.vqvae",
                  "taming.modules.vqvae.quantize"):
        sys.modules.setdefault(_name, types.ModuleType(_name))
    sys.modules["taming.modules.vqvae.quantize"].VectorQuantizer2 = object

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from external.imagen_pytorch import Unet as RefUnet  # noqa: E402
from external.ldm.models.autoencoder import AutoencoderKL as RefVAE  # noqa
from external.plms import PLMSSampler as RefPLMSSampler  # noqa: E402
from sparsefusion.eft import EpipolarFeatureTransformer as RefEFT  # noqa
from sparsefusion.vldm import DDPM as RefDDPM  # noqa: E402

from sparsefusion_tpu.core.cameras import Cameras  # noqa: E402
from sparsefusion_tpu.core.rays import grid_ray_bundle  # noqa: E402
from sparsefusion_tpu.diffusion import plms as plms_mod  # noqa: E402
from sparsefusion_tpu.diffusion.ddpm import DDPM, DDPMConfig  # noqa: E402
from sparsefusion_tpu.diffusion.plms import plms_sample_host  # noqa: E402
from sparsefusion_tpu.nn.eft import (  # noqa: E402
    EFTConfig,
    EpipolarFeatureTransformer,
)
from sparsefusion_tpu.nn.unet import EfficientUNet, UNetConfig  # noqa
from sparsefusion_tpu.nn.vae import AutoencoderKL, VAEConfig  # noqa: E402
from sparsefusion_tpu.ops.image import resize_bilinear  # noqa: E402
from sparsefusion_tpu.render.lightfield import (  # noqa: E402
    render_light_field,
)
from sparsefusion_tpu.train.convert import (  # noqa: E402
    convert_eft_state_dict,
    convert_unet_state_dict,
    convert_vae_state_dict,
)

# the SF 4-level topology at reduced width (see test_parity_ref.py) with
# the REAL 256-channel EFT conditioning interface
IMG = 64                       # image size (SF: 256)
EFT_HW = IMG // 8              # EFT render res == latent res (SF: 32)
N_PTS = 20                     # pts/ray (init_light_field_renderer)
Z_SCALE = 0.18215              # demo.py:148

PIPE_UNET = dict(dim=64, dim_mults=(1, 2, 4, 4),
                 num_resnet_blocks=(2, 2, 2, 2),
                 layer_attns=(False, False, False, True),
                 layer_cross_attns=(False, False, False, False),
                 channels=4, cond_images_channels=256, attn_heads=4,
                 attn_dim_head=16)
PIPE_DD = dict(double_z=True, z_channels=4, resolution=IMG, in_channels=3,
               out_ch=3, ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=2,
               attn_resolutions=[], dropout=0.0)


def nhwc2nchw_np(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


@pytest.fixture(scope="module")
def pipeline_pair():
    torch.manual_seed(71)
    ref_eft = RefEFT(use_r=True, encoder="resnet18", return_features=True,
                     remove_unused_layers=False, verbose=False).eval()
    gen = torch.Generator().manual_seed(9)
    for m in ref_eft.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.3, 0.3, generator=gen)
            m.running_var.uniform_(0.5, 1.5, generator=gen)
    ref_unet = RefUnet(attn_pool_text=False, **PIPE_UNET).eval()
    ref_vae = RefVAE(ddconfig=dict(PIPE_DD), embed_dim=4,
                     lossconfig={"target": "torch.nn.Identity"}).eval()
    ref_ddpm = RefDDPM(
        unets=(ref_unet,), image_sizes=(EFT_HW,), channels=4,
        timesteps=500, cond_drop_prob=0.1, pred_objectives="noise",
        conditional=False, conditional_encoder=None,
        conditional_embed_dim=None, auto_normalize_img=False,
        clip_output=True, dynamic_thresholding=False, clip_value=10.0)

    eft_vars = jax.tree_util.tree_map(
        jnp.asarray, convert_eft_state_dict(ref_eft.state_dict()))
    unet_params = jax.tree_util.tree_map(jnp.asarray, convert_unet_state_dict(
        ref_unet.state_dict(), num_levels=4,
        num_resnet_blocks=PIPE_UNET["num_resnet_blocks"],
        layer_attns=PIPE_UNET["layer_attns"], prefix=""))
    vae_vars = jax.tree_util.tree_map(jnp.asarray, convert_vae_state_dict(
        ref_vae.state_dict(), ch_mult=(1, 2, 4, 4), num_res_blocks=2))

    mine_eft = EpipolarFeatureTransformer(EFTConfig())
    mine_unet = EfficientUNet(UNetConfig(**PIPE_UNET))
    mine_vae = AutoencoderKL(VAEConfig(ch=32, ch_mult=(1, 2, 4, 4),
                                       num_res_blocks=2))
    ddpm = DDPM(DDPMConfig(channels=4, image_size=EFT_HW, timesteps=500))
    return dict(ref_eft=ref_eft, ref_vae=ref_vae, ref_ddpm=ref_ddpm,
                eft_vars=eft_vars, unet_params=unet_params,
                vae_vars=vae_vars, mine_eft=mine_eft, mine_unet=mine_unet,
                mine_vae=mine_vae, ddpm=ddpm)


def _scene(seed):
    """Context + query cameras looking at the origin from z ~ 3, plus
    context images and a 'render' to fuse (both procedural)."""
    rng = np.random.RandomState(seed)
    NC = 3  # 2 context + 1 query

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
    ctx_imgs = rng.uniform(0, 1, (2, IMG, IMG, 3)).astype(np.float32)
    render = rng.uniform(0.05, 0.95, (1, IMG, IMG, 3)).astype(np.float32)
    return R, T, f, c, ctx_imgs, render


@pytest.mark.slow
@pytest.mark.parametrize("max_thres,cond_scale",
                         [(0.42, 1.0),    # fusion step semantics
                          (0.999, 2.0)])  # full-noise CFG generation
def test_assembled_pipeline_golden(pipeline_pair, monkeypatch, max_thres,
                                   cond_scale):
    pp = pipeline_pair
    R, T, f, c, ctx_imgs, render = _scene(101)
    size = np.tile(np.array([IMG, IMG], np.float32), (3, 1))
    lo, hi = 1.5, 4.5  # scene-adaptive near/far (mean cam dist ~3)

    # shared ray grid for the query camera (conventions validated vs
    # pytorch3d in tests/test_cameras.py) — render_light_field builds
    # the identical bundle internally on the jax side
    cams = Cameras.create(R, T, f, c, size)
    q_cam = jax.tree_util.tree_map(lambda a: a[2:3], cams)
    bundle = grid_ray_bundle(q_cam, EFT_HW, EFT_HW, N_PTS, lo, hi)
    # flat (N, 3)/(N, D) rays — the layout eft.batched_forward feeds the
    # reference forward with (eft.py:470-505)
    o_np = np.asarray(bundle.origins, np.float32).reshape(-1, 3)
    d_np = np.asarray(bundle.directions, np.float32).reshape(-1, 3)
    l_np = np.asarray(bundle.lengths, np.float32).reshape(-1, N_PTS)

    # ---- reference pipeline (torch) --------------------------------------
    stub_ctx = StubCameras(torch.from_numpy(f[:2]), torch.from_numpy(c[:2]),
                           torch.from_numpy(R[:2]), torch.from_numpy(T[:2]))
    ctx_t = torch.from_numpy(np.transpose(ctx_imgs, (0, 3, 1, 2)).copy())
    with torch.no_grad():
        pp["ref_eft"].encode(stub_ctx, ctx_t)
        rb = RayBundle(torch.from_numpy(o_np), torch.from_numpy(d_np),
                       torch.from_numpy(l_np),
                       torch.zeros(o_np.shape[0], 2))
        ref_rgb, ref_feat, _ = pp["ref_eft"](rb)
        # feature/eft-image cache entry (distillation.py:110-124)
        ref_feat_img = ref_feat.reshape(1, EFT_HW, EFT_HW, 256) \
            .permute(0, 3, 1, 2)
        ref_eft_img = F.interpolate(
            ref_rgb.reshape(1, EFT_HW, EFT_HW, 3).permute(0, 3, 1, 2),
            scale_factor=8.0, mode="bilinear")

        # VAE encode of the render (distillation.py:297-299;
        # normalize = x*2-1, common_utils.py:9-14)
        render_t = torch.from_numpy(
            np.transpose(render, (0, 3, 1, 2)).copy())
        latents_t = pp["ref_vae"].encode(render_t * 2.0 - 1.0).mode() \
            * Z_SCALE

    sampler = RefPLMSSampler(pp["ref_ddpm"], plms_steps=10)
    monkeypatch.setattr(torch, "randn_like",
                        lambda t: torch.zeros_like(t))
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype))
    monkeypatch.setattr(plms_mod, "_XPREV_JIT_CACHE", {})
    with torch.no_grad():
        pred_x0_t, _, _, ac_t = sampler.sample(
            image=latents_t, cond_images=ref_feat_img,
            cond_scale=cond_scale, max_thres=max_thres, use_tqdm=False,
            return_noise=True)
        # decode + unnormalize + clip (distillation.py:306-309)
        pred_img_t = ((pp["ref_vae"].decode(pred_x0_t / Z_SCALE) + 1.0)
                      / 2.0).clip(0.0, 1.0)
    ref_weight = float(1.0 - ac_t.reshape(-1)[0])

    # ---- ours (jax) -------------------------------------------------------
    ctx_cams = jax.tree_util.tree_map(lambda a: a[:2], cams)
    ctx_j = jnp.asarray(ctx_imgs)
    latent_ctx = pp["mine_eft"].apply(
        pp["eft_vars"], ctx_j,
        method=EpipolarFeatureTransformer.encode)

    def ray_fn(o, d, lengths):
        return pp["mine_eft"].apply(pp["eft_vars"], o, d, lengths,
                                    ctx_cams, ctx_j, latent_ctx)

    my_rgb, my_feat = render_light_field(ray_fn, q_cam, EFT_HW, EFT_HW,
                                         lo, hi, n_pts_per_ray=N_PTS,
                                         n_batches=4)
    my_eft_img = resize_bilinear(my_rgb, (IMG, IMG), align_corners=False)

    # cond-feature plumbing parity BEFORE the diffusion stage
    np.testing.assert_allclose(nhwc2nchw_np(my_feat),
                               ref_feat_img.numpy(), atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(nhwc2nchw_np(my_eft_img),
                               ref_eft_img.numpy(), atol=1e-3, rtol=1e-2)

    x = jnp.clip(jnp.asarray(render) * 2.0 - 1.0, -1.0, 1.0)
    my_latents = pp["mine_vae"].apply(
        pp["vae_vars"], x, method=AutoencoderKL.encode_mode) * Z_SCALE
    np.testing.assert_allclose(nhwc2nchw_np(my_latents),
                               latents_t.numpy(), atol=1e-3, rtol=1e-3)

    def denoise_fn(xx, log_snr, cond_images, keep):
        return pp["mine_unet"].apply({"params": pp["unet_params"]}, xx,
                                     log_snr, cond_images, keep)

    my_pred_x0, _, _, my_ac = plms_sample_host(
        pp["ddpm"], denoise_fn, jax.random.PRNGKey(0), my_latents,
        max_thres, cond_images=my_feat, cond_scale=cond_scale,
        plms_steps=10)
    my_pred_img = jnp.clip(
        (pp["mine_vae"].apply(pp["vae_vars"], my_pred_x0 / Z_SCALE,
                              method=AutoencoderKL.decode) + 1.0) / 2.0,
        0.0, 1.0)
    my_weight = float(1.0 - np.asarray(my_ac).reshape(-1)[0])

    # ---- image-level parity of the composed graph ------------------------
    np.testing.assert_allclose(nhwc2nchw_np(my_pred_x0),
                               pred_x0_t.numpy(), atol=5e-3, rtol=1e-2)
    np.testing.assert_allclose(nhwc2nchw_np(my_pred_img),
                               pred_img_t.numpy(), atol=5e-3, rtol=1e-2)
    assert abs(my_weight - ref_weight) < 1e-5
