from mcseg_tpu.ops.hha import depth_to_hha  # noqa: F401
from mcseg_tpu.ops.preprocess import (  # noqa: F401
    make_eval_preprocess,
    make_train_preprocess,
)
