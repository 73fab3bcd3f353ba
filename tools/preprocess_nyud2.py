"""NYUD2-DIR preprocessing artifacts: the FDS training subset and the
balanced per-pixel test mask.

Re-derivation of ``nyud2-dir/preprocess_nyud2.py:34-73``:

- FDS subset: 600 training images drawn uniformly at random; their CSV rows
  become ``nyu2_train_FDS_subset.csv`` (the clean loader used for the FDS
  stats pass).
- Balanced test mask: histogram all test-depth pixels into 100 bins over
  [0, 10] m, find the smallest non-empty bin count, and select that many
  pixels uniformly from every bin >= 7 — giving a label-balanced pixel mask
  (``test_balanced_mask.npy``) used at evaluation.

Usage: ``python -m tools.preprocess_nyud2 --data_dir ./data [--seed 0]``
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd

from imbalanced_regression_tpu.data.nyud2 import load_nyud2_split
from imbalanced_regression_tpu.ops.binning import bin_index_depth


def create_fds_subset(data_dir: str, size: int = 600, seed: int | None = None) -> str:
    if seed is not None:
        np.random.seed(seed)
    frame = pd.read_csv(os.path.join(data_dir, "nyu2_train.csv"), header=None)
    select = np.random.choice(len(frame), size=size, replace=False)
    np.save(os.path.join(data_dir, "FDS_train_subset_id.npy"), select)
    out = os.path.join(data_dir, "nyu2_train_FDS_subset.csv")
    frame.iloc[select].to_csv(out, index=False, header=False)
    return out


def create_balanced_test_mask(data_dir: str, bucket_start: int = 7,
                              seed: int | None = None) -> str:
    if seed is not None:
        np.random.seed(seed)
    test = load_nyud2_split(data_dir, "nyu2_test.csv", train=False)
    depth = test["target"][..., 0]  # [N, H, W]
    flat = depth.reshape(-1)
    counts, _ = np.histogram(flat, bins=100, range=(0.0, 10.0))
    select_num = int(counts[counts != 0].min())
    bins = np.asarray(bin_index_depth(flat, 100, 0))

    mask = np.zeros(flat.shape[0], dtype=np.uint8)
    for b in range(bucket_start, 100):
        idx = np.where(bins == b)[0]
        if len(idx) == 0:
            continue
        chosen = np.random.choice(idx, size=min(select_num, len(idx)), replace=False)
        mask[chosen] = 1
    out = os.path.join(data_dir, "test_balanced_mask.npy")
    np.save(out, mask.reshape(depth.shape))
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", type=str, default="./data")
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--subset_size", type=int, default=600)
    args = parser.parse_args()
    print("FDS subset:", create_fds_subset(args.data_dir, args.subset_size, args.seed))
    print("Balanced mask:", create_balanced_test_mask(args.data_dir, seed=args.seed))


if __name__ == "__main__":
    main()
