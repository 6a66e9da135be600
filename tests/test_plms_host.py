"""Host-loop PLMS must be bit-equal to the scan sampler."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsefusion_tpu.diffusion import DDPM, DDPMConfig
from sparsefusion_tpu.diffusion.plms import plms_sample, plms_sample_host


def denoise(x, log_snr, cond_images, keep_mask):
    return 0.1 * x + jnp.sin(log_snr).reshape(-1, 1, 1, 1) * 0.05


@pytest.mark.parametrize("max_thres", [0.35, 0.995, 0.004])
def test_host_loop_matches_scan(max_thres):
    ddpm = DDPM(DDPMConfig(timesteps=500))
    rng = jax.random.PRNGKey(3)
    image = jax.random.normal(jax.random.PRNGKey(7), (2, 4, 4, 4)) * 0.2

    scan_out = plms_sample(ddpm, denoise, rng, image, max_thres,
                           plms_steps=8)
    host_out = plms_sample_host(ddpm, denoise, rng, image, max_thres,
                                plms_steps=8)
    for a, b in zip(scan_out, host_out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # the jitted masked-scan tail (one dispatch for steps 1..S-1) must
    # also be bit-equal — same body code and key chain
    tail_out = plms_sample_host(ddpm, denoise, rng, image, max_thres,
                                plms_steps=8, scan_tail=True)
    for a, b in zip(scan_out, tail_out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # params-as-arguments threading (models.unet_apply form) must match
    # in both host modes
    def denoise_p(params, x, log_snr, cond_images, keep_mask):
        return params["s"] * x + jnp.sin(log_snr).reshape(-1, 1, 1, 1) * 0.05

    params = {"s": jnp.float32(0.1)}
    for st in (False, True):
        p_out = plms_sample_host(ddpm, denoise_p, rng, image, max_thres,
                                 plms_steps=8, scan_tail=st,
                                 unet_params=params)
        for a, b in zip(scan_out, p_out):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)
