from sparsefusion_tpu.render.volume import (
    VolumeRendererConfig,
    near_far_from_aabb,
    render_rays,
    render_rays_chunked,
    sample_pdf,
)
from sparsefusion_tpu.render.lightfield import render_light_field
from sparsefusion_tpu.render.occupancy import (
    OccupancyGrid,
    morton3D,
    morton3D_invert,
    packbits,
)
from sparsefusion_tpu.render.mesh import export_mesh, marching_tetrahedra
