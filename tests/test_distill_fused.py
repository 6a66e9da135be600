"""Fused-dispatch distillation iterations == the unfused reference loop.

``DistillConfig.fused_steps`` collapses each loop iteration's dispatch
chain into a few large jitted programs (bootstrap: one; fusion: four).
The fused programs reproduce the unfused path's key-split tree exactly
(split3 at the iteration top, then the ``fusion_step`` /
``plms_sample_host`` split structure), so the two loops must agree
numerically — only XLA fusion boundaries differ.
"""
import jax
import numpy as np

from sparsefusion_tpu.data.synthetic import make_synthetic_scene
from sparsefusion_tpu.diffusion.ddpm import DDPMConfig
from sparsefusion_tpu.distill.loop import DistillConfig, distillation_loop
from sparsefusion_tpu.models import build_models
from sparsefusion_tpu.nn.ngp import NGPConfig
from sparsefusion_tpu.nn.unet import UNetConfig
from sparsefusion_tpu.nn.vae import VAEConfig


def tiny_models():
    return build_models(
        jax.random.PRNGKey(0),
        latent_size=8,
        unet_config=UNetConfig(
            dim=32, dim_mults=(1, 2), num_resnet_blocks=(1, 1),
            layer_attns=(False, True), layer_cross_attns=(False, False),
            cond_images_channels=256, attn_heads=2, attn_dim_head=8),
        vae_config=VAEConfig(ch=32, ch_mult=(1, 1, 2, 2), num_res_blocks=1),
        ddpm_config=DDPMConfig(channels=4, image_size=8, timesteps=100),
    )


def _run(fused: bool, use_diffusion: bool, **cfg_overrides):
    models = tiny_models()
    scene = make_synthetic_scene(n_views=3, image_size=32, seed=0)
    cfg = DistillConfig(
        max_itr=4, start_fusion_step=1, n_aug_cameras=2,
        plms_steps=4, num_steps=8, upsample_steps=8, max_ray_batch=256,
        ngp=NGPConfig(num_levels=4, log2_hashmap_size=10),
        fused_steps=fused,
        # pin the unfused fusion arm to the host-PLMS scan-tail path —
        # the same programs the fused path reuses (itself bit-equal to
        # the pure-scan sampler, tests/test_plms_host.py)
        plms_host_loop=True, plms_scan_tail=True,
        **cfg_overrides)
    return distillation_loop(models, scene, [0, 1], cfg,
                             jax.random.PRNGKey(1),
                             use_diffusion=use_diffusion, verbose=False)


def _assert_params_close(a, b):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for (path, la), lb in zip(fa, fb):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=2e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path))


def test_fused_matches_unfused_with_diffusion():
    """2 bootstrap + 2 fusion iterations, identical losses and params."""
    ref = _run(fused=False, use_diffusion=True)
    fus = _run(fused=True, use_diffusion=True)
    np.testing.assert_allclose(fus["losses"], ref["losses"],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(fus["fusion_losses"], ref["fusion_losses"],
                               rtol=1e-4, atol=1e-6)
    _assert_params_close(ref["ngp_params"], fus["ngp_params"])


def test_fused_matches_unfused_photometric_only():
    ref = _run(fused=False, use_diffusion=False)
    fus = _run(fused=True, use_diffusion=False)
    np.testing.assert_allclose(fus["losses"], ref["losses"],
                               rtol=1e-4, atol=1e-6)
    _assert_params_close(ref["ngp_params"], fus["ngp_params"])


def test_fused_with_occupancy_and_subsampling():
    """The fused programs under the TPU-preset feature set (occupancy
    marching + ray-subsampled steps) stay finite and well-formed."""
    out = _run(fused=True, use_diffusion=True,
               use_occupancy=True, occupancy_start=1,
               occupancy_update_every=1, occ_march_steps=8,
               input_rays=64, fusion_rays=64, remat=False)
    assert np.all(np.isfinite(out["losses"]))
    assert np.all(np.isfinite(out["fusion_losses"]))
    assert np.all(np.isfinite(out["renders"]))
