"""Host-side input pipelines: batching, synthetic data, and the per-suite
dataset loaders (age CSV images, STS-B TSV text, NYUD2 depth pairs)."""

from imbalanced_regression_tpu.data.batching import batch_iterator, eval_batches  # noqa: F401
from imbalanced_regression_tpu.data.synthetic import synthetic_age_dataset  # noqa: F401
