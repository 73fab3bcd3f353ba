"""Numpy/torch oracles re-deriving the reference semantics for golden tests.

These are independent reimplementations of the behavior documented in
SURVEY.md §2 (per-unique-label loops, edge pooling/gating, EMA factors,
imputation), written against the spec — they intentionally follow the
reference's *sequential* structure so vectorized production code is tested
against the original access pattern.
"""

from __future__ import annotations

import numpy as np
import torch


def torch_calibrate_mean_var(matrix, m1, v1, m2, v2, clip_min, clip_max, mode):
    """Oracle for calibrate_mean_var with both guard modes
    (imdb-wiki-dir/utils.py:97-107 vs sts-b-dir/util.py:63-73)."""
    matrix = matrix.clone()
    if torch.sum(v1) < 1e-10:
        return matrix
    if mode == "nonzero":
        invalid_exists = bool((v1 == 0.0).any())
        valid = v1 != 0.0
    else:
        invalid_exists = bool((v1 <= 0.0).any() or (v2 < 0.0).any())
        valid = (v1 > 0.0) & (v2 >= 0.0)
    if invalid_exists:
        factor = torch.clamp(v2[valid] / v1[valid], clip_min, clip_max)
        matrix[:, valid] = (matrix[:, valid] - m1[valid]) * torch.sqrt(factor) + m2[valid]
        return matrix
    factor = torch.clamp(v2 / v1, clip_min, clip_max)
    return (matrix - m1) * torch.sqrt(factor) + m2


class FDSOracle:
    """Sequential numpy oracle of the reference FDS state machine."""

    def __init__(self, feature_dim, bucket_num=100, bucket_start=0, start_update=0,
                 start_smooth=1, momentum=0.9, window=None, grouping="age",
                 clip_min=0.1, clip_max=10.0, guard_mode="nonzero", impute_empty=False):
        b = bucket_num - bucket_start
        self.feature_dim = feature_dim
        self.bucket_num = bucket_num
        self.bucket_start = bucket_start
        self.start_update = start_update
        self.start_smooth = start_smooth
        self.momentum = momentum
        self.window = np.asarray(window, dtype=np.float64)
        self.grouping = grouping
        self.clip_min, self.clip_max, self.guard_mode = clip_min, clip_max, guard_mode
        self.impute_empty = impute_empty

        self.epoch = start_update
        self.running_mean = np.zeros((b, feature_dim))
        self.running_var = np.ones((b, feature_dim))
        self.running_mean_last_epoch = np.zeros((b, feature_dim))
        self.running_var_last_epoch = np.ones((b, feature_dim))
        self.smoothed_mean_last_epoch = np.zeros((b, feature_dim))
        self.smoothed_var_last_epoch = np.ones((b, feature_dim))
        self.num_samples_tracked = np.zeros(b)

    # -- helpers ------------------------------------------------------------
    def _var(self, feats):
        if feats.shape[0] == 1:
            return np.zeros(feats.shape[1])
        return np.var(feats, axis=0, ddof=1)

    def _groups(self, labels, bucket_idx):
        """Yield (bucket_row, member_mask) per unique group, reference order."""
        if self.grouping == "age":
            for label in np.unique(labels):
                if label > self.bucket_num - 1 or label < self.bucket_start:
                    continue
                if label == self.bucket_start:
                    mask = labels <= label
                elif label == self.bucket_num - 1:
                    mask = labels >= label
                else:
                    mask = labels == label
                yield int(label - self.bucket_start), mask
        else:
            assert bucket_idx is not None
            bucket_idx = np.asarray(bucket_idx)
            for bucket in np.unique(bucket_idx):
                yield int(bucket - self.bucket_start), bucket_idx == bucket

    # -- transitions ----------------------------------------------------------
    def update_running_stats(self, features, labels, epoch, bucket_idx=None):
        if epoch < self.epoch:
            return
        features = np.asarray(features, dtype=np.float64)
        present = set()
        for row, mask in self._groups(labels, bucket_idx):
            feats = features[mask]
            n = feats.shape[0]
            self.num_samples_tracked[row] += n
            factor = self.momentum if self.momentum is not None else \
                (1 - n / float(self.num_samples_tracked[row]))
            factor = 0 if epoch == self.start_update else factor
            self.running_mean[row] = (1 - factor) * feats.mean(axis=0) + factor * self.running_mean[row]
            self.running_var[row] = (1 - factor) * self._var(feats) + factor * self.running_var[row]
            present.add(row)
        if self.impute_empty:
            b = self.bucket_num - self.bucket_start
            for row in range(b):
                if row not in present:
                    if row == 0:
                        self.running_mean[0] = self.running_mean[1]
                        self.running_var[0] = self.running_var[1]
                    elif row == b - 1:
                        self.running_mean[row] = self.running_mean[row - 1]
                        self.running_var[row] = self.running_var[row - 1]
                    else:
                        self.running_mean[row] = (self.running_mean[row - 1] + self.running_mean[row + 1]) / 2.0
                        self.running_var[row] = (self.running_var[row - 1] + self.running_var[row + 1]) / 2.0

    def update_last_epoch_stats(self, epoch):
        if epoch == self.epoch + 1:
            self.epoch += 1
            self.running_mean_last_epoch = self.running_mean.copy()
            self.running_var_last_epoch = self.running_var.copy()
            self.smoothed_mean_last_epoch = self._smooth(self.running_mean_last_epoch)
            self.smoothed_var_last_epoch = self._smooth(self.running_var_last_epoch)

    def _smooth(self, stats):
        half = (len(self.window) - 1) // 2
        padded = np.concatenate([stats[1 : half + 1][::-1], stats, stats[-half - 1 : -1][::-1]], axis=0)
        out = np.zeros_like(stats)
        for k, w in enumerate(self.window):
            out += w * padded[k : k + stats.shape[0]]
        return out

    def smooth(self, features, labels, epoch, bucket_idx=None):
        features = np.asarray(features, dtype=np.float64).copy()
        if epoch < self.start_smooth:
            return features
        for row, mask in self._groups(labels, bucket_idx):
            out = torch_calibrate_mean_var(
                torch.tensor(features[mask]),
                torch.tensor(self.running_mean_last_epoch[row]),
                torch.tensor(self.running_var_last_epoch[row]),
                torch.tensor(self.smoothed_mean_last_epoch[row]),
                torch.tensor(self.smoothed_var_last_epoch[row]),
                self.clip_min, self.clip_max, self.guard_mode,
            )
            features[mask] = out.numpy()
        return features
