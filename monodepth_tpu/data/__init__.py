from monodepth_tpu.data.augment import color_jitter, decode_frames  # noqa: F401
from monodepth_tpu.data.dataset import KittiDataset  # noqa: F401
from monodepth_tpu.data.kitti import (  # noqa: F401
    NORMALIZED_K,
    intrinsics,
    parse_split_line,
    readlines,
    stereo_transform,
    velodyne_to_depth,
)
from monodepth_tpu.data.pipeline import Loader, prefetch_to_device  # noqa: F401
