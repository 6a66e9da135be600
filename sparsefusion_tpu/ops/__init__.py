from sparsefusion_tpu.ops.image import (
    grid_sample_bilinear,
    resize_bilinear,
    resize_nearest,
)
from sparsefusion_tpu.ops.grid_encode import (
    GridEncoding,
    grid_encode,
    make_grid_encoding,
)
from sparsefusion_tpu.ops.grid_encode_blocked import (
    BlockedGridEncoding,
    blocked_grid_encode,
    blocked_grid_encode_bound,
    expand_blocked_tables,
    make_blocked_encoding,
)
