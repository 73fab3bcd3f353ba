"""Build the age-suite meta CSVs from raw corpora.

Re-derivation of the reference curation scripts
(``imdb-wiki-dir/data/create_imdb_wiki.py``, ``agedb-dir/data/create_agedb.py``):

- IMDB-WIKI: ages computed from Matlab date-of-birth ordinals + photo year
  (photo assumed mid-year), rows filtered by minimum face score, presence of
  a second face, and age in [0, 200];
- AgeDB: age parsed from the ``<id>_<name>_<age>_<gender>.jpg`` filename.

Usage::

    python -m tools.create_age_meta imdb_wiki --data_path ./data [--min_score 1.0]
    python -m tools.create_age_meta agedb --data_path ./data
"""

from __future__ import annotations

import argparse
import os
from datetime import datetime

import numpy as np
import pandas as pd


def calc_age(photo_year: int, dob_ordinal: float) -> int:
    """Age at photo time from a Matlab serial date number; photos assumed
    taken mid-year (``create_imdb_wiki.py:10-16``)."""
    birth = datetime.fromordinal(max(int(dob_ordinal) - 366, 1))
    return photo_year - birth.year - (0 if birth.month < 7 else 1)


def create_imdb_or_wiki(data_path: str, db: str, min_score: float = 1.0) -> pd.DataFrame:
    from scipy.io import loadmat

    meta = loadmat(os.path.join(data_path, f"{db}_crop", f"{db}.mat"))[db][0, 0]
    full_path = meta["full_path"][0]
    dob = meta["dob"][0]
    photo_taken = meta["photo_taken"][0]
    face_score = meta["face_score"][0]
    second_face_score = meta["second_face_score"][0]

    ages, paths = [], []
    for i in range(len(face_score)):
        if face_score[i] < min_score:
            continue
        if not np.isnan(second_face_score[i]) and second_face_score[i] > 0.0:
            continue
        age = calc_age(photo_taken[i], dob[i])
        if not 0 <= age <= 200:
            continue
        ages.append(age)
        paths.append(full_path[i][0])
    return pd.DataFrame({"age": ages, "path": paths})


def create_imdb_wiki(data_path: str, min_score: float = 1.0) -> str:
    frames = []
    for db in ("imdb", "wiki"):
        df = create_imdb_or_wiki(data_path, db, min_score)
        df["path"] = df["path"].map(lambda p: f"{db}_crop/{p}")
        frames.append(df)
    out_dir = os.path.join(data_path, "meta")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "imdb_wiki.csv")
    pd.concat(frames).to_csv(out, index=False)
    return out


def create_agedb(data_path: str) -> str:
    ages, paths = [], []
    for filename in sorted(os.listdir(os.path.join(data_path, "AgeDB"))):
        parts = filename.split(".")[0].split("_")
        if len(parts) != 4:
            continue
        ages.append(parts[2])
        paths.append(f"AgeDB/{filename}")
    out_dir = os.path.join(data_path, "meta")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "agedb.csv")
    pd.DataFrame({"age": ages, "path": paths}).to_csv(out, index=False)
    return out


def main():
    parser = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("dataset", choices=["imdb_wiki", "agedb"])
    parser.add_argument("--data_path", type=str, default="./data")
    parser.add_argument("--min_score", type=float, default=1.0)
    args = parser.parse_args()
    if args.dataset == "imdb_wiki":
        out = create_imdb_wiki(args.data_path, args.min_score)
    else:
        out = create_agedb(args.data_path)
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()
