from sparsefusion_tpu.render.volume import (
    VolumeRendererConfig,
    near_far_from_aabb,
    render_rays,
    sample_pdf,
)
from sparsefusion_tpu.render.lightfield import render_light_field
