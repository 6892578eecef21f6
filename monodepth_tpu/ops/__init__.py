from monodepth_tpu.ops.geometry import (  # noqa: F401
    axis_angle_to_rotation,
    backproject,
    disparity_to_depth,
    project,
    transform_from_parameters,
    translation_to_matrix,
    warp_grid,
)
from monodepth_tpu.ops.sampling import (  # noqa: F401
    downsample_2x_avg,
    grid_sample,
    pyramid,
    resize_bilinear,
    upsample_nearest_2x,
)
from monodepth_tpu.ops.ssim import reprojection_error, ssim  # noqa: F401
