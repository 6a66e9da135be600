"""Model bundle: EFT + SD-VAE + VLDM, the SparseFusion trio.

Equivalent of ``utils/load_model.py:12-100``: constructs the three models
with the canonical hyperparameters and (optionally) loads converted
checkpoints.  The bundle exposes the functional entry points the pipeline
needs (denoise_fn, vae encode/decode with the latent scale factor, EFT
encode + bound ray functions), all ready to close over in jitted steps.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from sparsefusion_tpu.core.cameras import Cameras
from sparsefusion_tpu.diffusion.ddpm import DDPM, DDPMConfig
from sparsefusion_tpu.nn.eft import EFTConfig, EpipolarFeatureTransformer
from sparsefusion_tpu.nn.unet import EfficientUNet, UNetConfig
from sparsefusion_tpu.nn.vae import AutoencoderKL, VAEConfig

Z_SCALE_FACTOR = 0.18215  # SD latent scale (demo.py:148)


@dataclasses.dataclass
class SparseFusionModels:
    eft_model: EpipolarFeatureTransformer
    eft_vars: Any
    vae_model: AutoencoderKL
    vae_vars: Any
    unet_model: EfficientUNet
    unet_params: Any
    ddpm: DDPM
    z_scale_factor: float = Z_SCALE_FACTOR

    # ------------------------------------------------------------- denoise
    def denoise_fn(self) -> Callable:
        """Closure form (params baked in).

        NOTE: do not jit this at full model size on a remote-compile
        backend — closed-over arrays are embedded in the HLO as literals
        (~2 GB for the dim-256 UNet in f32).  Use :meth:`unet_apply` and
        pass ``unet_params`` as a jit argument instead.
        """
        model, params = self.unet_model, self.unet_params

        def fn(x, log_snr, cond_images, keep_mask):
            return model.apply({"params": params}, x, log_snr, cond_images,
                               keep_mask)

        return fn

    def unet_apply(self, params, x, log_snr, cond_images, keep_mask):
        """Param-explicit UNet apply — the jit-friendly form (params ride
        as program arguments, not embedded constants)."""
        return self.unet_model.apply({"params": params}, x, log_snr,
                                     cond_images, keep_mask)

    def unet_apply_fn(self, bf16: bool = False) -> Callable:
        """Stable-identity param-explicit UNet apply.

        The returned function is cached on the bundle, so jit caches
        keyed on it (plms._eval_eps_jit etc.) survive across scenes —
        a fresh bound method per ``distillation_loop`` call would
        retrace every UNet program per scene.  ``bf16=True`` runs the
        UNet with bfloat16 activations (params stay f32, output upcast)
        — safe for the no-grad sampler path, ~2x on the MXU.
        """
        attr = "_unet_apply_bf16" if bf16 else "_unet_apply_f32"
        fn = getattr(self, attr, None)
        if fn is None:
            model = (EfficientUNet(self.unet_model.config,
                                   dtype=jnp.bfloat16)
                     if bf16 else self.unet_model)

            def fn(params, x, log_snr, cond_images, keep_mask):
                out = model.apply({"params": params}, x, log_snr,
                                  cond_images, keep_mask)
                return out.astype(jnp.float32)

            setattr(self, attr, fn)
        return fn

    def unet_params_half(self):
        """bf16 copy of the UNet params, cast ON DEVICE once and cached.

        At batch-1 latent sizes the sampler's UNet eval is WEIGHT-
        bandwidth bound, and flax's ``dtype=bfloat16`` modules cast the
        f32 params at every eval — so each of the ~25 PLMS steps re-reads
        the full f32 weights from HBM (which is why ``sampler_bf16``
        originally measured *slower* than f32, PERF.md round 2).
        Pre-casting halves the per-eval weight traffic; pass the result
        as the sampler's ``unet_params``.  No-grad path only — training
        keeps the f32 master copy.
        """
        half = getattr(self, "_unet_params_half", None)
        # keyed on the params object: checkpoint loading reassigns
        # ``models.unet_params`` after construction
        if half is None or getattr(self, "_unet_params_half_src",
                                   None) is not self.unet_params:
            half = jax.jit(
                lambda p: jax.tree_util.tree_map(
                    lambda a: a.astype(jnp.bfloat16), p))(self.unet_params)
            self._unet_params_half = half
            self._unet_params_half_src = self.unet_params
        return half

    def sampler_unet_params(self, bf16: bool):
        """The params to feed ``unet_apply_fn(bf16=...)`` with."""
        return self.unet_params_half() if bf16 else self.unet_params

    # ----------------------------------------------------------------- vae
    def vae_encode_p(self, vae_vars, images_01: jnp.ndarray) -> jnp.ndarray:
        """Param-explicit: [0,1] RGB (B,H,W,3) -> scaled latents."""
        x = jnp.clip(images_01 * 2.0 - 1.0, -1.0, 1.0)
        mean = self.vae_model.apply(vae_vars, x,
                                    method=AutoencoderKL.encode_mode)
        return mean * self.z_scale_factor

    def vae_decode_p(self, vae_vars, z: jnp.ndarray) -> jnp.ndarray:
        """Param-explicit: scaled latents -> [0,1] RGB."""
        x = self.vae_model.apply(vae_vars, z / self.z_scale_factor,
                                 method=AutoencoderKL.decode)
        return jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)

    def vae_encode(self, images_01: jnp.ndarray) -> jnp.ndarray:
        """[0,1] RGB (B,H,W,3) -> scaled latents (B,H/8,W/8,4)."""
        return self.vae_encode_p(self.vae_vars, images_01)

    def vae_decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """Scaled latents -> [0,1] RGB."""
        return self.vae_decode_p(self.vae_vars, z)

    # ----------------------------------------------------------------- eft
    def eft_encode(self, images: jnp.ndarray) -> jnp.ndarray:
        """Context images (NC,H,W,3) -> resnet pyramid latents."""
        return self.eft_model.apply(
            self.eft_vars, images,
            method=EpipolarFeatureTransformer.encode)

    def eft_ray_fn(self, input_cameras: Cameras, input_images: jnp.ndarray,
                   encoder_latent: jnp.ndarray) -> Callable:
        """Bind context views: returns (o, d, lengths) -> (rgb, feat)."""
        model, variables = self.eft_model, self.eft_vars

        def fn(origins, directions, lengths):
            return model.apply(variables, origins, directions, lengths,
                               input_cameras, input_images, encoder_latent)

        return fn


def build_models(rng: jax.Array,
                 dtype: jnp.dtype = jnp.float32,
                 init_image_size: int = 256,
                 latent_size: int = 32,
                 timesteps: int = 500,
                 unet_config: Optional[UNetConfig] = None,
                 vae_config: Optional[VAEConfig] = None,
                 eft_config: Optional[EFTConfig] = None,
                 ddpm_config: Optional[DDPMConfig] = None
                 ) -> SparseFusionModels:
    """Construct the SF trio with fresh params (checkpoint loading is done
    separately via ``train/convert.py`` / orbax restore).

    Defaults reproduce ``utils/load_model.py:12-91``; pass smaller configs
    for tests or alternative model families.
    """
    k_eft, k_vae, k_unet = jax.random.split(rng, 3)

    eft_model = EpipolarFeatureTransformer(eft_config or EFTConfig(),
                                           dtype=dtype)
    # init via a tiny dummy query
    dummy_cams = Cameras.create(
        jnp.eye(3)[None], jnp.zeros((1, 3)), jnp.ones((1, 2)),
        jnp.zeros((1, 2)), jnp.full((1, 2), float(init_image_size)))
    dummy_img = jnp.zeros((1, 32, 32, 3))

    def eft_init_fn(model):
        latent = model.encode(dummy_img)
        return model(jnp.zeros((4, 3)), jnp.ones((4, 3)),
                     jnp.ones((4, 2)), dummy_cams, dummy_img, latent)

    # inits run under jit: an eager Flax init dispatches thousands of
    # single-op programs through the remote relay (~7 min per process);
    # one jitted init program per model is persistent-cacheable instead
    eft_vars = jax.jit(lambda k: eft_model.init(k, method=eft_init_fn))(
        k_eft)

    vae_model = AutoencoderKL(vae_config or VAEConfig(), dtype=dtype)
    vae_vars = jax.jit(
        lambda k: vae_model.init(k, jnp.zeros((1, 64, 64, 3))))(k_vae)

    ucfg = unet_config or UNetConfig()
    unet_model = EfficientUNet(ucfg, dtype=dtype)
    unet_params = jax.jit(lambda k: unet_model.init(
        k, jnp.zeros((1, latent_size, latent_size, ucfg.channels)),
        jnp.zeros((1,)),
        jnp.zeros((1, latent_size, latent_size,
                   ucfg.cond_images_channels)))["params"])(k_unet)

    ddpm = DDPM(ddpm_config or DDPMConfig(timesteps=timesteps))
    return SparseFusionModels(
        eft_model=eft_model, eft_vars=eft_vars,
        vae_model=vae_model, vae_vars=vae_vars,
        unet_model=unet_model, unet_params=unet_params,
        ddpm=ddpm)


def count_params(tree) -> int:
    import numpy as np
    return int(sum(np.prod(p.shape)
                   for p in jax.tree_util.tree_leaves(tree)))
