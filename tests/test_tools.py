"""Dataset curation tooling tests (reference semantics: balanced splits,
STS resplit sizes, NYUD2 artifacts)."""

import os
import random

import numpy as np
import pandas as pd
import pytest

from tools.create_age_meta import calc_age
from tools.make_balanced_splits import make_balanced_testset


def test_calc_age_midyear_rule():
    # Matlab ordinal for ~1980-01-15 birth: early-month birth → age = taken - year
    from datetime import date

    early = date(1980, 3, 1).toordinal() + 366
    late = date(1980, 9, 1).toordinal() + 366
    assert calc_age(2000, early) == 20
    assert calc_age(2000, late) == 19


def test_balanced_split_semantics(rng):
    ages = np.concatenate([np.repeat(30, 600), np.repeat(70, 40), np.repeat(100, 4)])
    df = pd.DataFrame({"age": ages, "path": [f"img_{i}.jpg" for i in range(len(ages))]})
    out = make_balanced_testset(df, max_size=150, seed=666)
    # age 30: 600 samples → min(200, 150)=150 each to val/test
    sub = out[out["age"] == 30]["split"].value_counts()
    assert sub["val"] == 150 and sub["test"] == 150 and sub["train"] == 300
    # age 70: 40 → 13 each
    sub = out[out["age"] == 70]["split"].value_counts()
    assert sub["val"] == 13 and sub["test"] == 13
    # age 100: 4 → 1 each
    sub = out[out["age"] == 100]["split"].value_counts()
    assert sub["val"] == 1 and sub["test"] == 1
    # deterministic under the fixed seed
    out2 = make_balanced_testset(df, max_size=150, seed=666)
    assert (out["split"] == out2["split"]).all()


STS_DIR = "/root/reference/sts-b-dir/glue_data/STS-B"


@pytest.mark.skipif(not os.path.exists(os.path.join(STS_DIR, "train.tsv")),
                    reason="GLUE STS-B raw data not present")
def test_sts_resplit_sizes(tmp_path):
    import shutil

    from tools.create_sts_splits import resplit

    work = tmp_path / "STS-B"
    work.mkdir()
    for name in ("train.tsv", "dev.tsv"):
        shutil.copy(os.path.join(STS_DIR, name), work / name)
    resplit(str(work), seed=0)
    for name, expected in (("train_new.tsv", 5249), ("dev_new.tsv", 1000), ("test_new.tsv", 1000)):
        with open(work / name) as fh:
            rows = fh.readlines()
        assert len(rows) - 1 == expected, (name, len(rows) - 1)
    # dev/test are balanced: exactly 50 samples in each of the 20 bins
    edges = np.histogram(np.array([], np.float32), bins=20, range=(0.0, 5.0))[1]
    for name in ("dev_new.tsv", "test_new.tsv"):
        with open(work / name) as fh:
            fh.readline()
            scores = [np.float32(r.split("\t")[9]) for r in fh]
        bins = [19 if s == 5.0 else int(np.where(edges > s)[0][0] - 1) for s in scores]
        counts = np.bincount(bins, minlength=20)
        assert (counts == 50).all(), counts


def test_nyud2_balanced_mask(tmp_path, monkeypatch):
    """Balanced-mask creation on synthetic depth data: per-bucket pixel counts
    are equal (capped by the rarest bucket)."""
    import tools.preprocess_nyud2 as pp

    depth = np.random.default_rng(0).uniform(0.7, 10.0, size=(4, 16, 24)).astype(np.float32)
    monkeypatch.setattr(pp, "load_nyud2_split", lambda *a, **k: {"target": depth[..., None]})
    out = pp.create_balanced_test_mask(str(tmp_path), seed=0)
    mask = np.load(out)
    assert mask.shape == depth.shape
    flat_bins = (depth.reshape(-1) * np.float32(10)).astype(int).clip(max=99)
    counts, _ = np.histogram(depth.reshape(-1), bins=100, range=(0, 10))
    expected = counts[counts != 0].min()
    selected = mask.reshape(-1).astype(bool)
    per_bucket = np.bincount(flat_bins[selected], minlength=100)
    assert per_bucket[per_bucket > 0].max() <= expected


def test_sweep_rrt_vanilla_pairing_and_resume(tmp_path, monkeypatch):
    """RRT stage 2 loads the matching vanilla stage-1 checkpoint (the
    reference recipe, imdb-wiki-dir/train.py:154-155) and resumes
    independently: a restart after stage-1 recorded still runs stage-2."""
    import json

    from tools import sweep

    calls = []

    def fake_run(config):
        calls.append(config)
        os.makedirs(os.path.join(config.store_root, config.derived_store_name()),
                    exist_ok=True)
        return {"test": {"l1": 1.0, "mse": 1.0},
                "shots": {"many": {"l1": 1.0}, "median": {"l1": 1.0}, "low": {"l1": 1.0}}}

    monkeypatch.setattr(sweep.age, "run", fake_run)
    argv = ["--store_root", str(tmp_path), "--losses", "l1",
            "--reweights", "none", "sqrt_inv", "--lds_options", "0",
            "--fds_options", "0", "--rrt", "--synthetic_size", "16",
            "--img_size", "32", "--epoch", "1"]
    sweep.main(argv)

    stage2 = [c for c in calls if c.retrain_fc]
    assert len(stage2) == 1 and len(calls) == 3  # vanilla + sqinv + stage-2
    vanilla = next(c for c in calls if c.reweight == "none" and not c.retrain_fc)
    assert stage2[0].pretrained.endswith(vanilla.derived_store_name())
    assert stage2[0].reweight == "sqrt_inv"

    # full JSONL → a rerun does nothing
    calls.clear()
    sweep.main(argv)
    assert calls == []

    # drop only the stage-2 record → the rerun redoes exactly stage-2
    results = tmp_path / "sweep_results.jsonl"
    records = [json.loads(l) for l in results.read_text().splitlines()]
    results.write_text("\n".join(
        json.dumps(r) for r in records if "rrt_from" not in r) + "\n")
    calls.clear()
    sweep.main(argv)
    assert [c.retrain_fc for c in calls] == [True]


def test_sweep_orders_vanilla_cells_first(tmp_path, monkeypatch):
    """User-supplied --reweights order must not break RRT pairing: the
    vanilla (reweight none) cell runs before reweighted cells of the same
    (seed, loss) even when listed last."""
    from tools import sweep

    calls = []

    def fake_run(config):
        calls.append(config)
        os.makedirs(os.path.join(config.store_root, config.derived_store_name()),
                    exist_ok=True)
        return {"test": {"l1": 1.0, "mse": 1.0},
                "shots": {"many": {"l1": 1.0}, "median": {"l1": 1.0}, "low": {"l1": 1.0}}}

    monkeypatch.setattr(sweep.age, "run", fake_run)
    sweep.main(["--store_root", str(tmp_path), "--losses", "l1",
                "--reweights", "sqrt_inv", "none",  # reversed on purpose
                "--lds_options", "0", "--fds_options", "0", "--rrt",
                "--synthetic_size", "16", "--img_size", "32", "--epoch", "1"])
    assert [c.reweight for c in calls] == ["none", "sqrt_inv", "sqrt_inv"]
    assert [c.retrain_fc for c in calls] == [False, False, True]


def test_sweep_rrt_from_mode_mismatch_reruns(tmp_path, monkeypatch):
    """A sweep resumed under the other --rrt_from mode must rerun stage 2
    against the newly requested source, not silently skip (the store name
    does not encode the pairing)."""
    from tools import sweep

    calls = []

    def fake_run(config):
        calls.append(config)
        os.makedirs(os.path.join(config.store_root, config.derived_store_name()),
                    exist_ok=True)
        return {"test": {"l1": 1.0, "mse": 1.0},
                "shots": {"many": {"l1": 1.0}, "median": {"l1": 1.0}, "low": {"l1": 1.0}}}

    monkeypatch.setattr(sweep.age, "run", fake_run)
    base = ["--store_root", str(tmp_path), "--losses", "l1",
            "--reweights", "none", "sqrt_inv", "--lds_options", "0",
            "--fds_options", "0", "--rrt", "--synthetic_size", "16",
            "--img_size", "32", "--epoch", "1"]
    sweep.main(base + ["--rrt_from", "self"])
    calls.clear()
    sweep.main(base + ["--rrt_from", "vanilla"])  # resumed under other mode
    assert len(calls) == 1 and calls[0].retrain_fc
    vanilla_name = calls[0].pretrained
    assert "sqrt_inv" not in os.path.basename(vanilla_name)


def test_sts_seeds_budget_key(tmp_path, monkeypatch):
    """Rerunning sts_seeds with a different budget must NOT skip cells
    recorded under the old budget (tools/sts_seeds.py done-key fix)."""
    import json

    from imbalanced_regression_tpu.tasks import stsb as stsb_mod
    from tools import sts_seeds

    calls = []

    def fake_run(config):
        calls.append(config)
        return {"test": {"overall": {"mse": 1.0}}}

    monkeypatch.setattr(stsb_mod, "run", fake_run)
    base = ["--data_dir", "unused", "--seeds", "0", "--arms", "vanilla",
            "--store_root", str(tmp_path), "--d_hid", "8",
            "--n_layers_enc", "1", "--batch_size", "4"]
    sts_seeds.main(base + ["--max_vals", "2", "--val_interval", "3"])
    assert len(calls) == 1
    # same budget -> skipped
    sts_seeds.main(base + ["--max_vals", "2", "--val_interval", "3"])
    assert len(calls) == 1
    # different budget -> reruns instead of silently skipping
    sts_seeds.main(base + ["--max_vals", "5", "--val_interval", "3"])
    assert len(calls) == 2
    records = [json.loads(l) for l in
               (tmp_path / "sts_seed_results.jsonl").read_text().splitlines()]
    assert [r["config"]["max_vals"] for r in records] == [2, 5]
