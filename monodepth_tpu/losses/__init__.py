from monodepth_tpu.losses.metrics import (  # noqa: F401
    METRIC_NAMES,
    depth_errors,
    masked_median_low,
    training_depth_metric,
)
from monodepth_tpu.losses.reprojection import min_reprojection, monodepth_loss  # noqa: F401
from monodepth_tpu.losses.smoothness import edge_aware_smoothness, smooth_loss  # noqa: F401
