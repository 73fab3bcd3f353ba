"""Pure compute ops: kernel windows, LDS weighting, binning, moments,
calibration and weighted losses (jnp reference paths + Pallas TPU kernels)."""

from imbalanced_regression_tpu.ops.kernels import (  # noqa: F401
    get_lds_kernel_window,
    get_fds_kernel_window,
)
from imbalanced_regression_tpu.ops.losses import (  # noqa: F401
    weighted_mse_loss,
    weighted_l1_loss,
    weighted_focal_mse_loss,
    weighted_focal_l1_loss,
    weighted_huber_loss,
)
from imbalanced_regression_tpu.ops.calibrate import calibrate_mean_var  # noqa: F401
from imbalanced_regression_tpu.ops.binning import (  # noqa: F401
    bin_index_hist_np,
    hist_bin_edges,
    bin_index_depth,
    bin_index_age,
)
from imbalanced_regression_tpu.ops.lds import (  # noqa: F401
    prepare_weights_age,
    prepare_weights_hist,
    prepare_weights_depth,
)
from imbalanced_regression_tpu.ops.smoothing import smooth_bucket_stats  # noqa: F401
from imbalanced_regression_tpu.ops.moments import BucketMoments, bucket_moments  # noqa: F401
