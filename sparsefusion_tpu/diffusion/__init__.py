from sparsefusion_tpu.diffusion.schedule import (
    GaussianDiffusion,
    alpha_cosine_log_snr,
    beta_linear_log_snr,
    log_snr_to_alpha_sigma,
)
from sparsefusion_tpu.diffusion.ddpm import DDPM, DDPMConfig
from sparsefusion_tpu.diffusion.plms import PLMSSampler, plms_sample
