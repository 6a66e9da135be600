from sparsefusion_tpu.utils.image import (
    huber,
    normalize,
    split_list,
    unnormalize,
)
from sparsefusion_tpu.utils.metrics import psnr, ssim
