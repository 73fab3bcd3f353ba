"""Flax model zoo: ResNet regressors (age suites), the GloVe+BiLSTM pair
encoder (STS-B), and the depth encoder-decoder (NYUD2).

All models are split into a *backbone* producing the penultimate encoding and
a *head* mapping (possibly FDS-calibrated) encodings to predictions, mirroring
where the reference hooks FDS into each forward pass."""

from imbalanced_regression_tpu.models.resnet import ResNetBackbone, RegressionHead, resnet50_backbone  # noqa: F401
