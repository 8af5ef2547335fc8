from mcseg_tpu.losses.seg import cross_entropy_2d, berhu_loss  # noqa: F401
from mcseg_tpu.losses.discrepancy import (  # noqa: F401
    discrepancy_diff,
    discrepancy_symkl,
    get_prob_distance_criterion,
)
