"""Continuous-time Gaussian diffusion schedules as pure JAX functions.

Re-derivation of the reference's ``GaussianDiffusionContinuousTimes``
(``external/imagen_pytorch.py:190-297``, itself following @crowsonkb's
v-diffusion): time t in [0, 1] maps to a log-SNR; alpha = sqrt(sigmoid(snr)),
sigma = sqrt(sigmoid(-snr)).  Everything is a pure function of (t, x) so it
jits/vmaps/scans trivially and runs in fp32 regardless of activation dtype
(sampler numerics are the flagged risk in SURVEY.md section 7).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _log(t: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return jnp.log(jnp.clip(t, min=eps))


def beta_linear_log_snr(t: jnp.ndarray) -> jnp.ndarray:
    """log SNR for the linear-beta schedule: -log(expm1(1e-4 + 10 t^2))."""
    return -jnp.log(jnp.expm1(1e-4 + 10.0 * (t ** 2)))


def alpha_cosine_log_snr(t: jnp.ndarray, s: float = 0.008) -> jnp.ndarray:
    """log SNR for the cosine schedule (eps matches the reference's 1e-5)."""
    return -_log(
        jnp.cos((t + s) / (1 + s) * math.pi * 0.5) ** -2 - 1.0, eps=1e-5)


def log_snr_to_alpha_sigma(log_snr: jnp.ndarray):
    return (jnp.sqrt(jax.nn.sigmoid(log_snr)),
            jnp.sqrt(jax.nn.sigmoid(-log_snr)))


def right_pad_dims_to(x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Reshape (B,) t to broadcast against x's trailing dims."""
    pad = x.ndim - t.ndim
    if pad <= 0:
        return t
    return t.reshape(*t.shape, *((1,) * pad))


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """A continuous-time schedule (static config; all methods pure)."""

    noise_schedule: str = "cosine"
    num_timesteps: int = 1000

    def log_snr(self, t: jnp.ndarray) -> jnp.ndarray:
        if self.noise_schedule == "linear":
            return beta_linear_log_snr(t)
        if self.noise_schedule == "cosine":
            return alpha_cosine_log_snr(t)
        raise ValueError(f"invalid noise schedule {self.noise_schedule}")

    # -- conditioning signal fed to the UNet (the log SNR itself) ----------
    def get_condition(self, times: Optional[jnp.ndarray]):
        return None if times is None else self.log_snr(times)

    # -- time sampling ------------------------------------------------------
    def sample_random_times(self, rng: jax.Array, batch: int,
                            max_thres: float = 0.999) -> jnp.ndarray:
        return jax.random.uniform(rng, (batch,), minval=0.0, maxval=max_thres)

    def sample_random_times_bounded(self, rng: jax.Array, batch: int,
                                    min_thres=0.0,
                                    max_thres=0.999) -> jnp.ndarray:
        u = jax.random.uniform(rng, (batch,))
        return min_thres + u * (max_thres - min_thres)

    def get_sampling_timesteps(self, batch: int) -> jnp.ndarray:
        """(steps, 2, batch) consecutive (t, t_next) pairs from 1 to 0."""
        times = jnp.linspace(1.0, 0.0, self.num_timesteps + 1)
        pairs = jnp.stack([times[:-1], times[1:]], axis=1)  # (steps, 2)
        return jnp.broadcast_to(pairs[:, :, None],
                                (self.num_timesteps, 2, batch))

    def get_sampling_timesteps_custom(self, batch: int, n_steps: int,
                                      min_thres=0.0,
                                      max_thres=0.999) -> jnp.ndarray:
        """(n_steps, 2, batch) pairs from max_thres down to min_thres."""
        times = jnp.linspace(max_thres, min_thres, n_steps + 1)
        pairs = jnp.stack([times[:-1], times[1:]], axis=1)
        return jnp.broadcast_to(pairs[:, :, None], (n_steps, 2, batch))

    # -- forward process ----------------------------------------------------
    def q_sample(self, x_start: jnp.ndarray, t: jnp.ndarray,
                 noise: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Noise x_start to time t. Returns (x_t, log_snr (B,))."""
        t = jnp.asarray(t)
        if t.ndim == 0:
            t = jnp.full((x_start.shape[0],), t, x_start.dtype)
        log_snr = self.log_snr(t)
        padded = right_pad_dims_to(x_start, log_snr)
        alpha, sigma = log_snr_to_alpha_sigma(padded)
        return alpha * x_start + sigma * noise, log_snr

    def q_posterior(self, x_start: jnp.ndarray, x_t: jnp.ndarray,
                    t: jnp.ndarray, t_next: Optional[jnp.ndarray] = None):
        """Posterior q(x_{t_next} | x_t, x_0): (mean, var, log_var_clipped).

        Continuous-time expression (DDPM++ eq. 33 as used by the reference,
        ``imagen_pytorch.py:240-258``).
        """
        if t_next is None:
            t_next = jnp.clip(t - 1.0 / self.num_timesteps, min=0.0)
        log_snr = right_pad_dims_to(x_t, self.log_snr(t))
        log_snr_next = right_pad_dims_to(x_t, self.log_snr(t_next))
        alpha, _ = log_snr_to_alpha_sigma(log_snr)
        alpha_next, sigma_next = log_snr_to_alpha_sigma(log_snr_next)
        c = -jnp.expm1(log_snr - log_snr_next)
        posterior_mean = alpha_next * (x_t * (1 - c) / alpha + c * x_start)
        posterior_variance = (sigma_next ** 2) * c
        return posterior_mean, posterior_variance, _log(
            posterior_variance, eps=1e-20)

    def predict_start_from_noise(self, x_t: jnp.ndarray, t: jnp.ndarray,
                                 noise: jnp.ndarray) -> jnp.ndarray:
        log_snr = right_pad_dims_to(x_t, self.log_snr(t))
        alpha, sigma = log_snr_to_alpha_sigma(log_snr)
        return (x_t - sigma * noise) / jnp.clip(alpha, min=1e-8)

    def q_sample_from_to(self, x_from: jnp.ndarray, from_t, to_t,
                         noise: jnp.ndarray) -> jnp.ndarray:
        """Renoise x_from from time from_t up to to_t (inpaint resampling)."""
        batch = x_from.shape[0]
        from_t = jnp.broadcast_to(jnp.asarray(from_t), (batch,))
        to_t = jnp.broadcast_to(jnp.asarray(to_t), (batch,))
        log_snr = right_pad_dims_to(x_from, self.log_snr(from_t))
        alpha, sigma = log_snr_to_alpha_sigma(log_snr)
        log_snr_to = right_pad_dims_to(x_from, self.log_snr(to_t))
        alpha_to, sigma_to = log_snr_to_alpha_sigma(log_snr_to)
        return (x_from * (alpha_to / alpha)
                + noise * (sigma_to * alpha - sigma * alpha_to) / alpha)
