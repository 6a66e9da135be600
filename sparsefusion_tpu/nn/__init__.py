from sparsefusion_tpu.nn.unet import EfficientUNet, UNetConfig, sparsefusion_unet_config
from sparsefusion_tpu.nn.vae import AutoencoderKL, VAEConfig
from sparsefusion_tpu.nn.resnet import ResNet18Features
from sparsefusion_tpu.nn.eft import EpipolarFeatureTransformer, EFTConfig
from sparsefusion_tpu.nn.ngp import NGPField, NGPConfig
