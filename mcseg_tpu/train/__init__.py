from mcseg_tpu.train.optim import get_optimizer, poly_lr  # noqa: F401
from mcseg_tpu.train.state import MCDTrainState, create_train_state  # noqa: F401
from mcseg_tpu.train.source import make_source_step  # noqa: F401
from mcseg_tpu.train.mcd import make_mcd_step  # noqa: F401
