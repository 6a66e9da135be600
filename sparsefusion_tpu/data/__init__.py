from sparsefusion_tpu.data.contract import SceneData
from sparsefusion_tpu.data.co3d_toy import CO3DToyDataset
from sparsefusion_tpu.data.synthetic import make_synthetic_scene
