from monodepth_tpu.training.state import TrainState, create_state, make_optimizer  # noqa: F401
from monodepth_tpu.training.step import (  # noqa: F401
    apply_and_warp,
    make_eval_step,
    make_train_multi_step,
    make_train_step,
)
from monodepth_tpu.training.loop import Trainer  # noqa: F401  # isort: skip
