"""Create the DIR balanced val/test splits for the age suites.

Re-derivation of ``imdb-wiki-dir/data/preprocess_imdb_wiki.py:20-44`` /
``agedb-dir/data/preprocess_agedb.py``: for every integer age 0..120, shuffle
that age's samples (``random.seed(666)``) and move up to ``max_size`` (150 for
IMDB-WIKI, 30 for AgeDB) into val and the same count into test — yielding
*balanced* evaluation splits over the label range while train keeps the
natural imbalance.

Usage::

    python -m tools.make_balanced_splits --db imdb_wiki --max_size 150
    python -m tools.make_balanced_splits --db agedb --max_size 30
"""

from __future__ import annotations

import argparse
import os
import random

import pandas as pd


def make_balanced_testset(df: pd.DataFrame, max_size: int, seed: int = 666,
                          max_age: int = 121) -> pd.DataFrame:
    df = df.copy()
    df["age"] = df.age.astype(int)
    val_set, test_set = [], []
    rng = random.Random(seed)
    for value in range(max_age):
        paths = list(df[df["age"] == value]["path"].values)
        rng.shuffle(paths)
        size = min(len(paths) // 3, max_size)
        val_set += paths[:size]
        test_set += paths[size : size * 2]
    assert not set(val_set) & set(test_set)
    split = {p: "val" for p in val_set}
    split.update({p: "test" for p in test_set})
    df["split"] = df["path"].map(split).fillna("train")
    return df


def main():
    parser = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--db", type=str, default="imdb_wiki", choices=["imdb_wiki", "agedb"])
    parser.add_argument("--data_path", type=str, default="./data")
    parser.add_argument("--max_size", type=int, default=None,
                        help="per-age cap for val/test (default: 150 imdb_wiki, 30 agedb)")
    parser.add_argument("--seed", type=int, default=666)
    args = parser.parse_args()
    max_size = args.max_size if args.max_size is not None else (150 if args.db == "imdb_wiki" else 30)

    df = pd.read_csv(os.path.join(args.data_path, "meta", f"{args.db}.csv"))
    out = make_balanced_testset(df, max_size, args.seed)
    out_path = os.path.join(args.data_path, f"{args.db}.csv")
    out.to_csv(out_path, index=False)
    counts = out["split"].value_counts()
    print(f"Wrote {out_path}: " + ", ".join(f"{k}={v}" for k, v in counts.items()))


if __name__ == "__main__":
    main()
