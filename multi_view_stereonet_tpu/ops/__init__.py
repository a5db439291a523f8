"""TPU compute primitives: warps, resizes, pooling.

The bilinear-gather warp (grid_sample equivalent) is the framework's hot
non-conv op; everything else (convs, resizes, softmin) is expressed so XLA
maps it onto the MXU -- in particular resizes are separable matmuls rather
than gathers.
"""

from .resize import (
    resize_bilinear,
    resize_area,
    build_image_pyramid,
    upsample_mask,
    avg_pool_same,
)
from .warp import (
    grid_sample,
    homography_grid,
    homography_warp,
    plane_sweep_warp,
)

__all__ = [
    "resize_bilinear",
    "resize_area",
    "build_image_pyramid",
    "upsample_mask",
    "avg_pool_same",
    "grid_sample",
    "homography_grid",
    "homography_warp",
    "plane_sweep_warp",
]
