from mcseg_tpu.models.factory import get_models  # noqa: F401
