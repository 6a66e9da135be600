"""Tests for schedules, DDPM losses/sampling, and the PLMS scan sampler."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from sparsefusion_tpu.diffusion import (
    DDPM,
    DDPMConfig,
    GaussianDiffusion,
    alpha_cosine_log_snr,
    beta_linear_log_snr,
    log_snr_to_alpha_sigma,
)
from sparsefusion_tpu.diffusion.ddpm import clip_x_start
from sparsefusion_tpu.diffusion.plms import _x_prev_from_eps, plms_sample


def test_log_snr_formulas():
    t = np.linspace(0.01, 0.99, 13).astype(np.float32)
    # independently computed reference formulas
    cos_expected = -np.log(np.clip(
        np.cos((t + 0.008) / 1.008 * math.pi / 2) ** -2 - 1, 1e-5, None))
    np.testing.assert_allclose(alpha_cosine_log_snr(jnp.asarray(t)),
                               cos_expected, rtol=1e-4)
    lin_expected = -np.log(np.expm1(1e-4 + 10 * t ** 2))
    np.testing.assert_allclose(beta_linear_log_snr(jnp.asarray(t)),
                               lin_expected, rtol=1e-4)


def test_alpha_sigma_unit_norm():
    t = jnp.linspace(0.0, 0.999, 21)
    log_snr = alpha_cosine_log_snr(t)
    a, s = log_snr_to_alpha_sigma(log_snr)
    np.testing.assert_allclose(a ** 2 + s ** 2, np.ones(21), atol=1e-6)


def test_q_sample_predict_start_roundtrip():
    sched = GaussianDiffusion("cosine", 500)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (2, 8, 8, 4))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([0.3, 0.7])
    xt, log_snr = sched.q_sample(x0, t, noise)
    back = sched.predict_start_from_noise(xt, t, noise)
    np.testing.assert_allclose(back, x0, atol=1e-4)
    assert log_snr.shape == (2,)


def test_q_posterior_at_same_time_is_identity():
    sched = GaussianDiffusion("cosine", 500)
    x0 = jnp.ones((1, 4, 4, 2)) * 0.5
    xt = jnp.ones((1, 4, 4, 2)) * 0.2
    t = jnp.array([0.5])
    mean, var, _ = sched.q_posterior(x0, xt, t, t)
    np.testing.assert_allclose(mean, xt, atol=1e-5)
    np.testing.assert_allclose(var, np.zeros_like(var), atol=1e-7)


def test_sampling_timesteps():
    sched = GaussianDiffusion("cosine", 10)
    ts = sched.get_sampling_timesteps(3)
    assert ts.shape == (10, 2, 3)
    np.testing.assert_allclose(ts[0, 0], np.ones(3))
    np.testing.assert_allclose(ts[-1, 1], np.zeros(3))
    # consecutive pairs
    np.testing.assert_allclose(ts[:-1, 1], ts[1:, 0])


def test_clip_x_start_static_and_dynamic():
    x = jnp.array([[[[5.0, -20.0, 0.5, 3.0]]]])
    cfg = DDPMConfig(clip_value=10.0, dynamic_thresholding=False)
    np.testing.assert_allclose(clip_x_start(x, cfg)[0, 0, 0],
                               [5.0, -10.0, 0.5, 3.0])
    cfg_dyn = DDPMConfig(dynamic_thresholding=True,
                         dynamic_thresholding_percentile=1.0)
    out = clip_x_start(x, cfg_dyn)
    np.testing.assert_allclose(out[0, 0, 0], np.array([5, -20, 0.5, 3]) / 20,
                               atol=1e-5)


def perfect_denoiser(target_x0):
    """eps prediction that makes predict_start return target_x0 exactly."""
    sched = GaussianDiffusion("cosine", 500)

    def fn(x, log_snr, cond_images, keep_mask):
        a, s = log_snr_to_alpha_sigma(log_snr)
        a = a.reshape(-1, 1, 1, 1)
        s = s.reshape(-1, 1, 1, 1)
        return (x - a * target_x0) / jnp.clip(s, min=1e-8)

    return fn


def test_p_losses_zero_for_perfect_eps_prediction():
    ddpm = DDPM(DDPMConfig(timesteps=500))
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))

    captured = {}

    def spy_denoise(x, log_snr, cond_images, keep_mask):
        captured["log_snr"] = log_snr
        a, s = log_snr_to_alpha_sigma(log_snr.reshape(-1, 1, 1, 1))
        return (x - a * x0) / jnp.clip(s, min=1e-8)  # = true noise

    times = jnp.array([0.4, 0.6])
    loss = ddpm.p_losses(spy_denoise, x0, times, rng)
    assert float(loss) < 1e-6


def test_p_sample_loop_converges_to_target():
    ddpm = DDPM(DDPMConfig(timesteps=50))
    target = jnp.full((1, 4, 4, 4), 0.7)
    out = ddpm.p_sample_loop(perfect_denoiser(target), jax.random.PRNGKey(0),
                             (1, 4, 4, 4))
    np.testing.assert_allclose(out, target, atol=0.05)


def test_forward_noloss_shapes():
    ddpm = DDPM(DDPMConfig(timesteps=500))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    fn = perfect_denoiser(jnp.zeros_like(x))
    pred, pred_x0, x_noisy, noise, ac = ddpm.forward_noloss(
        fn, jax.random.PRNGKey(1), x, max_thres=0.9)
    assert pred.shape == x.shape
    assert ac.shape == (2,)
    assert np.all(np.asarray(ac) > 0) and np.all(np.asarray(ac) < 1)


def test_plms_converges_to_target():
    # note: the reference PLMS variant injects posterior noise every step
    # (plms.py:209-212), so even a perfect denoiser only lands near the
    # target in distribution, not exactly.
    ddpm = DDPM(DDPMConfig(timesteps=500))
    target = jnp.full((1, 4, 4, 4), 0.3)
    img, x_noisy, noise, ac = plms_sample(
        ddpm, perfect_denoiser(target), jax.random.PRNGKey(0), target,
        max_thres=0.5, plms_steps=50)
    assert abs(float(img.mean()) - 0.3) < 0.1
    assert float(jnp.abs(img - target).mean()) < 0.25
    assert ac.shape == (1,)
    # shallow start stays close to the input
    img2, *_ = plms_sample(ddpm, perfect_denoiser(target),
                           jax.random.PRNGKey(1), target, max_thres=0.1,
                           plms_steps=50)
    assert float(jnp.abs(img2 - target).mean()) < 0.2


def test_plms_nsteps_zero_returns_qsampled():
    ddpm = DDPM(DDPMConfig(timesteps=500))
    image = jnp.full((1, 4, 4, 4), 0.3)
    img, x_noisy, noise, _ = plms_sample(
        ddpm, perfect_denoiser(image), jax.random.PRNGKey(0), image,
        max_thres=0.004, plms_steps=50)
    # n_steps = int(0.004 * 100) = 0 -> no denoising happens
    np.testing.assert_allclose(img, x_noisy, atol=1e-6)


def test_plms_scan_matches_python_loop():
    """The fixed-shape scan must equal a straightforward Python-loop PLMS."""
    ddpm = DDPM(DDPMConfig(timesteps=500))
    sched = ddpm.schedule
    steps = 8
    rng = jax.random.PRNGKey(42)
    image = jax.random.normal(jax.random.PRNGKey(7), (2, 4, 4, 4)) * 0.2
    max_thres = 0.35

    def denoise(x, log_snr, cond_images, keep_mask):
        return 0.1 * x + jnp.sin(log_snr).reshape(-1, 1, 1, 1) * 0.05

    got = plms_sample(ddpm, denoise, rng, image, max_thres, plms_steps=steps)

    # ---- python-loop replica with identical key-splitting structure ------
    batch = image.shape[0]
    n_steps = min(int(max_thres * steps * 2), steps)
    denom = float(max(n_steps, 1))
    times_all = np.array([max_thres * max(denom - i, 0) / denom
                          for i in range(steps + 1)], np.float32)
    k_init, k_loop = jax.random.split(rng)
    init_noise = jax.random.normal(k_init, image.shape, image.dtype)
    x_noisy, log_snr = sched.q_sample(image, max_thres, init_noise)
    img = x_noisy

    def eval_eps(x, t):
        return ddpm.forward_with_cond_scale(
            denoise, x, sched.get_condition(jnp.full((batch,), t)), None, 1.0)

    old_eps = []
    key = k_loop
    # step 0
    key, sub = jax.random.split(key)
    k1, k2, k3 = jax.random.split(sub, 3)
    t, t_next = times_all[0], times_all[1]
    e_t = eval_eps(img, t)
    x_prev1, _ = _x_prev_from_eps(ddpm, k1, img, jnp.full((batch,), t),
                                  jnp.full((batch,), t_next), e_t)
    e_t_next = eval_eps(x_prev1, t_next)
    e_prime = (e_t + e_t_next) / 2
    img, _ = _x_prev_from_eps(ddpm, k2, img, jnp.full((batch,), t),
                              jnp.full((batch,), t_next), e_prime)
    old_eps.append(e_t)
    # remaining steps
    for i in range(1, steps):
        if i >= n_steps:
            continue
        t, t_next = times_all[i], times_all[i + 1]
        k1, key = jax.random.split(key)
        e_t = eval_eps(img, t)
        if len(old_eps) == 1:
            e_prime = (3 * e_t - old_eps[-1]) / 2
        elif len(old_eps) == 2:
            e_prime = (23 * e_t - 16 * old_eps[-1] + 5 * old_eps[-2]) / 12
        else:
            e_prime = (55 * e_t - 59 * old_eps[-1] + 37 * old_eps[-2]
                       - 9 * old_eps[-3]) / 24
        img, _ = _x_prev_from_eps(ddpm, k1, img, jnp.full((batch,), t),
                                  jnp.full((batch,), t_next), e_prime)
        old_eps.append(e_t)
        if len(old_eps) >= 4:
            old_eps.pop(0)
    img = jnp.clip(img, -ddpm.config.clip_value, ddpm.config.clip_value)

    np.testing.assert_allclose(got[0], img, atol=1e-5)
    np.testing.assert_allclose(got[1], x_noisy, atol=1e-6)
