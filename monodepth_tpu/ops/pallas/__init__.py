from monodepth_tpu.ops.pallas.reprojection import (  # noqa: F401
    fused_reprojection_error,
    pallas_supported,
)
