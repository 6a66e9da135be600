from sparsefusion_tpu.parallel.mesh import (
    make_mesh,
    replicate_to_mesh,
    shard_batch,
    shard_scene_list,
)
