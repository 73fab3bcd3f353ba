"""Native JPEG loader throughput vs thread count.

The reference feeds IMDB-WIKI through a 32-worker torch DataLoader
(``imdb-wiki-dir/train.py:128-133``); our stream mode decodes through the
C++ pool in ``native/loader.cc``. This prints decoded img/s for a batch of
files at each requested thread count — the host-side half of the full-scale
rehearsal's steady-state throughput story (on a 1-core host the curve is
flat; on a real TPU-VM host it should scale near-linearly to the core
count, TSAN-verified race-free in tests/test_native_tsan.py).

Usage::

    python -m tools.loader_bench --root /tmp/imdbwiki_synth --img 224 \
        --batch 512 --threads 1 2 4 8
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True, help="directory containing JPEGs (searched recursively)")
    p.add_argument("--img", type=int, default=224)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--threads", nargs="*", type=int, default=[1, 2, 4])
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args(argv)

    from imbalanced_regression_tpu.data.native_loader import decode_resize_batch

    files = sorted(glob.glob(os.path.join(args.root, "**", "*.jpg"), recursive=True))[: args.batch]
    if not files:
        raise SystemExit(f"no JPEGs under {args.root}")
    results = {}
    for t in args.threads:
        decode_resize_batch(files[:32], args.img, threads=t)  # warm (page cache, pool)
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = decode_resize_batch(files, args.img, threads=t)
            best = min(best, time.perf_counter() - t0)
        assert out.shape == (len(files), args.img, args.img, 3)
        results[t] = len(files) / best
        print(f"threads={t:3d}  {results[t]:8.1f} img/s  ({best * 1e3:.0f} ms / {len(files)} files)")
    print(json.dumps({"img": args.img, "batch": len(files), "img_per_s": results}))


if __name__ == "__main__":
    main()
