"""imbalanced_regression_tpu — a TPU-native (JAX/Flax/XLA/Pallas) framework for
Deep Imbalanced Regression (DIR).

Re-designed from scratch with the capabilities of the reference benchmark suite
"Delving into Deep Imbalanced Regression" (ICML 2021), unified into a single
package with task plugins instead of the reference's copy-per-suite layout:

- ``ops``       pure compute: LDS/FDS kernel windows, LDS effective-density
                weights, label binning, per-bucket feature moments, feature
                calibration, weighted regression losses (jnp + Pallas paths).
- ``fds``       Feature Distribution Smoothing as functional state + jittable
                transitions (running EMA stats, bucket-axis smoothing,
                per-sample calibration).
- ``models``    Flax backbones: ResNet-50 regressor, GloVe+BiLSTM pair encoder,
                depth encoder-decoder.
- ``data``      host-side input pipelines and per-sample LDS weighting.
- ``parallel``  device-mesh construction and sharding helpers (DP over ICI).
- ``utils``     shot-partitioned metrics, meters, checkpointing, config.
"""

__version__ = "0.1.0"

from imbalanced_regression_tpu.ops import (  # noqa: F401
    get_lds_kernel_window,
    get_fds_kernel_window,
    weighted_mse_loss,
    weighted_l1_loss,
    weighted_focal_mse_loss,
    weighted_focal_l1_loss,
    weighted_huber_loss,
    calibrate_mean_var,
)
from imbalanced_regression_tpu.fds import (  # noqa: F401
    FDSConfig,
    FDSState,
    fds_init,
    fds_smooth,
    fds_update_running_stats,
    fds_update_last_epoch_stats,
    fds_reset,
)
