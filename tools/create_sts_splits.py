"""Re-split GLUE STS-B into the DIR benchmark splits.

Re-derivation of ``sts-b-dir/glue_data/create_sts.py``: pool the original
train+dev rows, bin targets into 20 histogram bins over [0, 5], draw 100
samples per bin without replacement (50 → dev, 50 → test), keep the rest for
train, and re-index rows. Produces ``{train,dev,test}_new.tsv`` with 5,249 /
1,000 / 1,000 rows for the standard GLUE data.

Usage: ``python -m tools.create_sts_splits --glue_dir ./glue_data/STS-B [--seed 0]``
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def resplit(glue_dir: str, bins: int = 20, select_num: int = 100, seed: int | None = None):
    if seed is not None:
        np.random.seed(seed)
    contents, targets = [], []
    header = None
    for name in ("train", "dev"):
        with open(os.path.join(glue_dir, f"{name}.tsv"), encoding="utf-8") as fh:
            header = fh.readline()
            for row in fh:
                contents.append(row)
                targets.append(np.float32(row.strip().split("\t")[9]))

    _, edges = np.histogram(np.asarray(targets), bins=bins, range=(0.0, 5.0))

    def bin_idx(label):
        if label == 5.0:
            return bins - 1
        return int(np.where(edges > label)[0][0] - 1)

    by_bin: list[list[str]] = [[] for _ in range(bins)]
    for row, t in zip(contents, targets):
        by_bin[bin_idx(t)].append(row)

    new = {"train": [], "dev": [], "test": []}
    for rows in by_bin:
        n = len(rows)
        dev_test = np.random.choice(n, size=select_num, replace=False)
        train_idx = np.setdiff1d(np.arange(n), dev_test)
        dev_idx = np.random.choice(dev_test, size=select_num // 2, replace=False)
        test_idx = np.setdiff1d(dev_test, dev_idx)
        rows = np.asarray(rows, dtype=object)
        new["train"] += rows[train_idx].tolist()
        new["dev"] += rows[dev_idx].tolist()
        new["test"] += rows[test_idx].tolist()

    for name, rows in new.items():
        out_path = os.path.join(glue_dir, f"{name}_new.tsv")
        with open(out_path, "w", encoding="utf-8") as fh:
            fh.write(header)
            for i, row in enumerate(rows):
                cols = row.split("\t")
                cols[0] = str(i)  # re-index
                fh.write("\t".join(cols))
    print("STS-B-DIR splits:", {k: len(v) for k, v in new.items()})


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--glue_dir", type=str, default="./glue_data/STS-B")
    parser.add_argument("--seed", type=int, default=None)
    args = parser.parse_args()
    resplit(args.glue_dir, seed=args.seed)


if __name__ == "__main__":
    main()
