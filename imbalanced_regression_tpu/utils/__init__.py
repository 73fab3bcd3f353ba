"""Host-side utilities: shot-partitioned evaluation metrics, meters,
checkpointing, config."""

from imbalanced_regression_tpu.utils.metrics import (  # noqa: F401
    DepthEvaluator,
    STSShotAverage,
    regression_metrics,
    shot_metrics,
)
from imbalanced_regression_tpu.utils.meters import AverageMeter, ProgressMeter  # noqa: F401
