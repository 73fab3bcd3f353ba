"""Dataset download helpers (host-side, network required).

Re-derivation of ``imdb-wiki-dir/download_imdb_wiki.py``,
``nyud2-dir/download_nyud2.py``, ``sts-b-dir/glove/download_glove.py``.
AgeDB requires requesting access from its authors (``agedb-dir/README.md``).

Usage: ``python -m tools.download {imdb_wiki,glove,nyud2} --out_dir ./data``
"""

from __future__ import annotations

import argparse
import os
import subprocess

URLS = {
    "imdb_wiki": [
        "https://data.vision.ee.ethz.ch/cvl/rrothe/imdb-wiki/static/imdb_crop.tar",
        "https://data.vision.ee.ethz.ch/cvl/rrothe/imdb-wiki/static/wiki_crop.tar",
    ],
    "glove": [
        "http://nlp.stanford.edu/data/glove.840B.300d.zip",
    ],
    "nyud2": [
        # DIR-provided processed NYUD2 archive (nyud2-dir/download_nyud2.py)
        "https://drive.google.com/uc?id=1WoOZOBpOWfmwe7bknWS5PMUCLBPFKTOw",
    ],
}


def fetch(name: str, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for url in URLS[name]:
        print(f"Fetching {url} -> {out_dir}")
        if "drive.google.com" in url:
            try:
                import gdown

                gdown.download(url, output=os.path.join(out_dir, ""), quiet=False)
            except ImportError:
                raise SystemExit("nyud2 download needs gdown (pip install gdown)")
        else:
            subprocess.run(["wget", "-c", "-P", out_dir, url], check=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("dataset", choices=sorted(URLS))
    parser.add_argument("--out_dir", type=str, default="./data")
    args = parser.parse_args()
    fetch(args.dataset, args.out_dir)


if __name__ == "__main__":
    main()
