"""DDPM training losses and ancestral sampling for the view-conditioned LDM.

Functional re-design of the reference ``DDPM`` wrapper
(``sparsefusion/vldm.py:53-776``) for the single-UNet SparseFusion config:
one latent-space UNet (32x32x4), image conditioning via a 256-channel EFT
feature map concatenated at the stem, no text path, classifier-free
guidance by conditioning dropout.

Everything takes an explicit ``denoise_fn(x, log_snr, cond_images,
keep_mask) -> eps`` so the same code drives the Flax UNet, an EMA copy, or
a mock in tests.  Sampling is a ``lax.scan`` over the timestep pairs —
one compiled graph, no Python loop.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from sparsefusion_tpu.diffusion.schedule import (
    GaussianDiffusion,
    right_pad_dims_to,
)

DenoiseFn = Callable[..., jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class DDPMConfig:
    """SparseFusion DDPM hyperparameters (``utils/load_model.py:76-91``)."""

    channels: int = 4
    image_size: int = 32
    timesteps: int = 500
    noise_schedule: str = "cosine"
    cond_drop_prob: float = 0.1
    pred_objective: str = "noise"
    loss_type: str = "l2"
    clip_output: bool = True
    clip_value: float = 10.0
    dynamic_thresholding: bool = False
    dynamic_thresholding_percentile: float = 0.68
    p2_loss_weight_gamma: float = 0.5
    p2_loss_weight_k: float = 1.0


def _loss(pred, target, loss_type):
    if loss_type == "l2":
        return (pred - target) ** 2
    if loss_type == "l1":
        return jnp.abs(pred - target)
    if loss_type == "huber":
        d = pred - target
        return jnp.where(jnp.abs(d) < 1.0, 0.5 * d * d, jnp.abs(d) - 0.5)
    raise NotImplementedError(loss_type)


def clip_x_start(x_start: jnp.ndarray, cfg: DDPMConfig) -> jnp.ndarray:
    """Static/dynamic thresholding of the predicted x0 (``vldm.py:318-332``)."""
    if not cfg.clip_output:
        return x_start
    if cfg.dynamic_thresholding:
        s = jnp.quantile(
            jnp.abs(x_start.reshape(x_start.shape[0], -1)),
            cfg.dynamic_thresholding_percentile, axis=-1)
        s = jnp.clip(s, min=1.0)
        s = right_pad_dims_to(x_start, s)
        return jnp.clip(x_start, -s, s) / s
    return jnp.clip(x_start, -cfg.clip_value, cfg.clip_value)


@dataclasses.dataclass(frozen=True)
class DDPM:
    """Bundles schedule + config; all methods are pure."""

    config: DDPMConfig = DDPMConfig()

    @property
    def schedule(self) -> GaussianDiffusion:
        return GaussianDiffusion(self.config.noise_schedule,
                                 self.config.timesteps)

    # ------------------------------------------------------------------ train
    def p_losses(self, denoise_fn: DenoiseFn, x_start: jnp.ndarray,
                 times: jnp.ndarray, rng: jax.Array,
                 cond_images: Optional[jnp.ndarray] = None,
                 loss_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Masked eps-prediction loss with p2 reweighting (``vldm.py:557-630``)."""
        cfg = self.config
        sched = self.schedule
        k_noise, k_drop = jax.random.split(rng)
        noise = jax.random.normal(k_noise, x_start.shape, x_start.dtype)
        x_noisy, log_snr = sched.q_sample(x_start, times, noise)

        keep_mask = jax.random.bernoulli(
            k_drop, 1.0 - cfg.cond_drop_prob, (x_start.shape[0],))
        pred = denoise_fn(x_noisy, sched.get_condition(times), cond_images,
                          keep_mask)

        target = noise if cfg.pred_objective == "noise" else x_start
        if loss_mask is not None:
            pred = pred * loss_mask
            target = target * loss_mask
        losses = _loss(pred, target, cfg.loss_type)
        losses = losses.reshape(losses.shape[0], -1).mean(axis=-1)

        if cfg.p2_loss_weight_gamma > 0:
            weight = (cfg.p2_loss_weight_k + jnp.exp(log_snr)) \
                ** -cfg.p2_loss_weight_gamma
            losses = losses * weight
        return losses.mean()

    # ----------------------------------------------------------- cfg forward
    def forward_with_cond_scale(self, denoise_fn: DenoiseFn, x, log_snr,
                                cond_images, cond_scale: float):
        """Classifier-free guidance (``imagen_pytorch.py:1456-1468``)."""
        b = x.shape[0]
        keep = jnp.ones((b,), bool)
        logits = denoise_fn(x, log_snr, cond_images, keep)
        if cond_scale == 1.0:
            return logits
        null_logits = denoise_fn(x, log_snr, cond_images,
                                 jnp.zeros((b,), bool))
        return null_logits + (logits - null_logits) * cond_scale

    # -------------------------------------------------------------- sampling
    def p_mean_variance(self, denoise_fn: DenoiseFn, x, t, t_next,
                        cond_images, cond_scale: float = 1.0):
        sched = self.schedule
        pred = self.forward_with_cond_scale(
            denoise_fn, x, sched.get_condition(t), cond_images, cond_scale)
        if self.config.pred_objective == "noise":
            x_start = sched.predict_start_from_noise(x, t, pred)
        else:
            x_start = pred
        x_start = clip_x_start(x_start, self.config)
        return sched.q_posterior(x_start, x, t, t_next)

    def p_sample(self, denoise_fn: DenoiseFn, rng: jax.Array, x, t, t_next,
                 cond_images, cond_scale: float = 1.0):
        mean, _, log_var = self.p_mean_variance(
            denoise_fn, x, t, t_next, cond_images, cond_scale)
        noise = jax.random.normal(rng, x.shape, x.dtype)
        is_last = (t_next == 0).astype(x.dtype)
        nonzero = right_pad_dims_to(x, 1.0 - is_last)
        return mean + nonzero * jnp.exp(0.5 * log_var) * noise

    def p_sample_loop(self, denoise_fn: DenoiseFn, rng: jax.Array,
                      shape: Tuple[int, ...],
                      cond_images: Optional[jnp.ndarray] = None,
                      cond_scale: float = 1.0) -> jnp.ndarray:
        """Full ancestral sampling from pure noise (``vldm.py:362-443``)."""
        sched = self.schedule
        batch = shape[0]
        k_init, k_loop = jax.random.split(rng)
        img = jax.random.normal(k_init, shape)
        timesteps = sched.get_sampling_timesteps(batch)  # (S, 2, B)

        def body(carry, t_pair):
            img, key = carry
            key, sub = jax.random.split(key)
            t, t_next = t_pair[0], t_pair[1]
            img = self.p_sample(denoise_fn, sub, img, t, t_next, cond_images,
                                cond_scale)
            return (img, key), None

        (img, _), _ = jax.lax.scan(body, (img, k_loop), timesteps)
        if self.config.clip_output:
            img = jnp.clip(img, -self.config.clip_value, self.config.clip_value)
        return img

    def sample(self, denoise_fn: DenoiseFn, rng: jax.Array,
               cond_images: Optional[jnp.ndarray] = None,
               batch_size: int = 1, cond_scale: float = 1.0) -> jnp.ndarray:
        """Top-level sampling entry (``vldm.py:445-555`` single-unet path):
        full ancestral chain conditioned on an EFT feature image."""
        if cond_images is not None:
            batch_size = cond_images.shape[0]
        shape = (batch_size, self.config.image_size, self.config.image_size,
                 self.config.channels)
        return self.p_sample_loop(denoise_fn, rng, shape, cond_images,
                                  cond_scale)

    # ------------------------------------------------- one-step distillation
    def forward_noloss(self, denoise_fn: DenoiseFn, rng: jax.Array,
                       images: jnp.ndarray,
                       cond_images: Optional[jnp.ndarray] = None,
                       min_thres: float = 0.0, max_thres: float = 0.999):
        """Single-step x0 prediction at a random time (``vldm.py:632-709``).

        Returns (pred_eps, pred_x0, x_noisy, noise, alpha_cumprod).
        """
        sched = self.schedule
        b = images.shape[0]
        k_t, k_n = jax.random.split(rng)
        times = sched.sample_random_times_bounded(k_t, b, min_thres, max_thres)
        noise = jax.random.normal(k_n, images.shape, images.dtype)
        x_noisy, log_snr = sched.q_sample(images, times, noise)
        keep = jnp.ones((b,), bool)
        pred = denoise_fn(x_noisy, sched.get_condition(times), cond_images,
                          keep)
        pred_x0 = sched.predict_start_from_noise(x_noisy, times, pred)
        if self.config.clip_output:
            pred_x0 = jnp.clip(pred_x0, -self.config.clip_value,
                               self.config.clip_value)
        alpha_cumprod = jax.nn.sigmoid(log_snr)
        return pred, pred_x0, x_noisy, noise, alpha_cumprod
