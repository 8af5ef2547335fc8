from mcseg_tpu.utils.util import (  # noqa: F401
    emphasize_str,
    mkdir_if_not_exist,
    save_dic_to_json,
)
from mcseg_tpu.utils.checkpoint import load_checkpoint, save_checkpoint  # noqa: F401
