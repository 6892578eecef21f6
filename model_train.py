"""Train CLI — the reference entry point, TPU-native.

    python model_train.py --pose_type separate --datatype kitti_eigen_zhou --batch 12

(reference: model_train.py:100-101 `trainer(options()).train()`;
flag surface documented in monodepth_tpu/config.py)
"""

from monodepth_tpu.utils.platform import apply_env_platform

apply_env_platform()

from monodepth_tpu.config import options  # noqa: E402
from monodepth_tpu.parallel import init_distributed  # noqa: E402
from monodepth_tpu.training import Trainer  # noqa: E402

if __name__ == "__main__":
    init_distributed()  # multi-host no-op unless a coordinator is set
    Trainer(options()).train()
