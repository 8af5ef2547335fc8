from mcseg_tpu.core.config import DataConfig, ModelConfig, TrainConfig  # noqa: F401
