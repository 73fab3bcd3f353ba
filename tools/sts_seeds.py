"""Multi-seed STS-B-DIR comparison: vanilla vs LDS+FDS, mean±std.

Runs the real-data STS-B driver for each (config, seed) pair sequentially in
one process and appends per-run shot metrics to a JSONL, then prints a
mean±std table per config — the error-bar evidence VERDICT.md round-1 asked
for on the one benchmark whose data ships with the reference checkout.

Both arms share the exact budget/protocol flags so the comparison is matched;
``--max_vals`` defaults lower than the reference's full protocol to bound
wall clock (the comparison is budget-matched, not budget-identical to the
published runs — state this when reporting).

The sweep is idempotent so it can run under ``tools.babysit``: (config, seed)
pairs already recorded in the results JSONL are skipped, and the in-flight
run resumes from its own store-dir checkpoint (the stsb driver starts fresh
when no checkpoint exists yet). ``--resume`` is accepted and ignored —
babysit appends it on restart; per-run self-resume does the actual work.

Usage::

    python -m tools.sts_seeds --data_dir <STS-B dir> --seeds 0 1 2 \
        [--val_interval 400 --max_vals 15 --patience 10] [--store_root runs/sts_seeds]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

# arm flags follow the reference's published training commands
# (sts-b-dir/README.md:59-120): LDS pairs with inverse re-weighting, FDS runs
# alone, huber is the --loss huber --huber_beta 0.3 variant, and RRT stage 2
# retrains the regression layer with inverse re-weighting on top of the
# matching vanilla stage-1 checkpoint (README.md:95-99, train.py:180-191).
ARMS = {
    "vanilla": dict(lds=False, fds=False, reweight="none"),
    "lds": dict(lds=True, fds=False, reweight="inverse", lds_sigma=2.0),
    "fds": dict(lds=False, fds=True, reweight="none", fds_sigma=2.0),
    "lds_fds": dict(lds=True, fds=True, reweight="inverse", lds_sigma=2.0,
                    fds_sigma=2.0),
    "huber": dict(lds=False, fds=False, reweight="none", loss="huber",
                  huber_beta=0.3),
    # Focal-R variants (imdb-wiki-dir/loss.py:21-37; --loss choices at
    # sts-b-dir/train.py:58) — the reference README tables carry Focal-R rows
    "focal_l1": dict(lds=False, fds=False, reweight="none", loss="focal_l1"),
    "focal_mse": dict(lds=False, fds=False, reweight="none", loss="focal_mse"),
    "rrt": dict(lds=False, fds=False, reweight="inverse", retrain_fc=True),
}

# fields that define the training budget/protocol: two records are only
# comparable (and a recorded run only skippable) when these all match
BUDGET_FIELDS = ("val_interval", "max_vals", "patience", "batch_size",
                 "d_hid", "n_layers_enc", "glove", "word_embs_file")


def _budget_key(arm: str, seed: int, cfg: dict) -> tuple:
    # .get: records written before a field joined BUDGET_FIELDS carry the
    # then-default implicitly
    return (arm, int(seed)) + tuple(cfg.get(f) for f in BUDGET_FIELDS)


def STSConfig_default_embs() -> str:
    from imbalanced_regression_tpu.tasks.stsb import STSConfig

    return STSConfig.word_embs_file


def main(argv=None):
    from imbalanced_regression_tpu.tasks import stsb

    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--data_dir", required=True)
    p.add_argument("--seeds", nargs="*", type=int, default=[0, 1, 2])
    p.add_argument("--arms", nargs="*", default=list(ARMS), choices=list(ARMS))
    p.add_argument("--glove", type=int, default=0)
    p.add_argument("--val_interval", type=int, default=400)
    p.add_argument("--max_vals", type=int, default=15)
    p.add_argument("--patience", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--store_root", default="runs/sts_seeds")
    p.add_argument("--d_hid", type=int, default=1500)  # smoke runs shrink this
    p.add_argument("--n_layers_enc", type=int, default=2)
    p.add_argument("--word_embs_file", default=STSConfig_default_embs(),
                   help="embedding text file (GloVe format); pair with "
                   "--glove 1 to initialize+freeze the table from it — e.g. "
                   "the corpus-internal vectors from tools/corpus_embeddings")
    p.add_argument("--resume", default="", help="ignored (babysit appends it); "
                   "runs self-resume from their own store dirs")
    args = p.parse_args(argv)

    if args.glove and not os.path.exists(args.word_embs_file):
        # --glove 1 FREEZES the table (train_words=0 default); a missing
        # vector file would silently train on frozen random embeddings
        raise SystemExit(f"--glove 1 but no embedding file at "
                         f"{args.word_embs_file!r} (tools/corpus_embeddings "
                         f"builds one from the training corpus)")
    os.makedirs(args.store_root, exist_ok=True)
    results_path = os.path.join(args.store_root, "sts_seed_results.jsonl")
    # done-keys include the budget fields: rerunning with a different
    # --max_vals/--d_hid/... must NOT silently skip cells recorded under the
    # old budget (which would average heterogeneous budgets into one row)
    done: set[tuple] = set()
    if os.path.exists(results_path):
        with open(results_path) as fh:
            for line in fh:
                if line.strip():
                    r = json.loads(line)
                    done.add(_budget_key(r["arm"], r["seed"], r["config"]))
    # seeds form the OUTER loop (mirroring tools/sweep) so a truncated sweep
    # yields every arm at the completed seeds — paired per-seed deltas stay
    # computable — rather than all seeds of the first arms only. Within a
    # seed, arm order is preserved, so listing vanilla before rrt still
    # satisfies the rrt stage-1 dependency.
    for seed in args.seeds:
        for arm in args.arms:
            config = stsb.STSConfig(
                dataset="stsb", data_dir=args.data_dir, glove=args.glove,
                seed=seed, store_root=args.store_root,
                val_interval=args.val_interval, max_vals=args.max_vals,
                patience=args.patience, batch_size=args.batch_size,
                d_hid=args.d_hid, n_layers_enc=args.n_layers_enc,
                word_embs_file=args.word_embs_file,
                **ARMS[arm],
            )
            if _budget_key(arm, seed, dataclasses.asdict(config)) in done:
                print(f"=== {arm}_seed{seed} === already recorded, skipping", flush=True)
                continue
            if arm == "rrt":
                # stage-1 = the same-seed vanilla run's best checkpoint
                src = stsb.STSConfig(
                    dataset="stsb", data_dir=args.data_dir, glove=args.glove,
                    seed=seed, store_root=args.store_root,
                    val_interval=args.val_interval, max_vals=args.max_vals,
                    patience=args.patience, batch_size=args.batch_size,
                    d_hid=args.d_hid, n_layers_enc=args.n_layers_enc,
                    word_embs_file=args.word_embs_file,
                    **ARMS["vanilla"],
                )
                src_dir = os.path.join(args.store_root, src.derived_store_name())
                if not os.path.isdir(os.path.join(src_dir, "best")):
                    raise SystemExit(
                        f"rrt arm needs the vanilla stage-1 best checkpoint at "
                        f"{src_dir}; run the vanilla arm for seed {seed} first")
                config = dataclasses.replace(config, pretrained=src_dir)
            # self-resume: restore_checkpoint fires only if this run's store
            # dir already holds a latest/best checkpoint (fresh start if not)
            store_dir = os.path.join(args.store_root, config.derived_store_name())
            config = dataclasses.replace(config, resume=store_dir)
            name = f"{arm}_seed{seed}"
            print(f"=== {name} ===", flush=True)
            result = stsb.run(config)
            with open(results_path, "a") as fh:
                fh.write(json.dumps({
                    "name": name, "arm": arm, "seed": seed,
                    "config": dataclasses.asdict(config),
                    "test": result["test"],
                }, default=float) + "\n")
    print_summary(results_path)


def print_summary(results_path: str, metric: str = "mse"):
    with open(results_path) as f:
        records = [json.loads(line) for line in f if line.strip()]
    regions = ("overall", "many", "medium", "few")
    # last record wins per (arm, seed): a cell re-run under a corrected
    # budget supersedes the stale one
    by_cell: dict[tuple, dict] = {}
    for r in records:
        by_cell[(r["arm"], r["seed"])] = r
    from tools.aggregate_results import usable  # shared gmean=0 guard
    by_arm: dict[str, dict[str, dict[int, float]]] = {}
    for (arm, seed), r in by_cell.items():
        slot = by_arm.setdefault(arm, {reg: {} for reg in regions})
        for reg in regions:
            v = r["test"].get(reg, {}).get(metric)
            if usable(metric, v):
                slot[reg][seed] = float(v)
    print(f"\ntest {metric} (mean±std across seeds)")
    header = f"{'arm':10s}  " + "  ".join(f"{r:>14s}" for r in regions) + "   n"
    print(header)
    print("-" * len(header))
    for arm, regs in sorted(by_arm.items()):
        cells, n = [], 0
        for reg in regions:
            vals = np.asarray(list(regs[reg].values()), float)
            if len(vals) == 0:
                cells.append(f"{'—':>14s}")
                continue
            std = vals.std(ddof=1) if len(vals) > 1 else 0.0
            cells.append(f"{vals.mean():7.3f}±{std:5.3f}")
            n = max(n, len(vals))
        print(f"{arm:10s}  " + "  ".join(cells) + f"  {n:2d}")

    base = by_arm.get("vanilla")
    if not base:
        return
    print(f"\npaired per-seed deltas vs vanilla (negative = better {metric})")
    print(header.replace("  n", "  n  (t)"))
    for arm, regs in sorted(by_arm.items()):
        if arm == "vanilla":
            continue
        cells, n, tstat = [], 0, float("nan")
        for reg in regions:
            shared = sorted(set(regs[reg]) & set(base[reg]))
            if not shared:
                cells.append(f"{'—':>14s}")
                continue
            d = np.asarray([regs[reg][s] - base[reg][s] for s in shared], float)
            std = d.std(ddof=1) if len(d) > 1 else 0.0
            cells.append(f"{d.mean():+7.3f}±{std:5.3f}")
            n = max(n, len(d))
            if reg == "overall" and len(d) > 1 and std > 0:
                tstat = d.mean() / (std / np.sqrt(len(d)))
        print(f"{arm:10s}  " + "  ".join(cells) + f"  {n:2d}  (t={tstat:+.2f})")


if __name__ == "__main__":
    main(sys.argv[1:])
