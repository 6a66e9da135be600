from sparsefusion_tpu.core.cameras import (
    Cameras,
    camera_centers,
    concat_cameras,
    get_camera_slice,
    get_relative_cameras,
    look_at_view_transform,
    transform_points_ndc,
    unproject_ndc_points,
    world_to_view,
)
from sparsefusion_tpu.core.harmonics import HarmonicEmbedding, harmonic_embedding
from sparsefusion_tpu.core.rays import (
    RayBundle,
    grid_ray_bundle,
    monte_carlo_ray_bundle,
    ray_points,
)
