from mcseg_tpu.eval.metrics import (  # noqa: F401
    fast_hist,
    miou_from_hist,
    per_class_iu,
    format_iou_table,
)
