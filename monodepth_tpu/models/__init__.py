from monodepth_tpu.models.depth_decoder import Conv3x3, ConvBlock, DepthDecoder  # noqa: F401
from monodepth_tpu.models.monodepth import Monodepth  # noqa: F401
from monodepth_tpu.models.pose_decoder import PoseCNN, PoseDecoder  # noqa: F401
from monodepth_tpu.models.resnet import ResNetEncoder, num_ch_enc  # noqa: F401
