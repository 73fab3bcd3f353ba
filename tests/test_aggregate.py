"""Multi-seed plumbing: seed-suffixed store names, per-seed RNG wiring, and
the mean±std aggregator over sweep JSONL records."""

import json

import numpy as np

from imbalanced_regression_tpu.utils.config import ExperimentConfig
from tools.aggregate_results import aggregate, strip_seed


def test_store_name_seed_suffix():
    assert not ExperimentConfig(seed=0).derived_store_name().endswith("seed0")
    assert ExperimentConfig(seed=3).derived_store_name().endswith("_seed3")
    assert strip_seed(ExperimentConfig(seed=3).derived_store_name()) == \
        ExperimentConfig(seed=0).derived_store_name()


def test_aggregate_mean_std(tmp_path):
    records = []
    for seed, l1 in ((0, 1.0), (1, 2.0), (2, 3.0)):
        records.append({
            "name": f"cfg_a_seed{seed}" if seed else "cfg_a",
            "seed": seed,
            "test": {"l1": l1, "mse": l1 ** 2},
            "shots": {"many": {"l1": l1 / 2}, "median": {"l1": l1 + 1},
                      "low": {"l1": float("nan")}},
        })
    agg = aggregate(records, "l1")
    a = agg["cfg_a"]
    assert a["all"]["n"] == 3
    np.testing.assert_allclose(a["all"]["mean"], 2.0)
    np.testing.assert_allclose(a["all"]["std"], 1.0)  # sample std of 1,2,3
    np.testing.assert_allclose(a["many"]["mean"], 1.0)
    assert "low" not in a  # NaNs dropped

    # end-to-end through the file reader
    path = tmp_path / "r.jsonl"
    path.write_text("".join(json.dumps(r) + "\n" for r in records))
    from tools.aggregate_results import load
    assert aggregate(load(str(path)), "l1")["cfg_a"]["all"]["n"] == 3


def test_gmean_zero_excluded_from_aggregation():
    """A gmean of exactly 0.0 (one exact-zero per-sample error collapses the
    reference's scipy gmean, imdb-wiki-dir/train.py:377) is a degenerate
    record: it must not be averaged into mean±std or paired deltas, while
    other metrics in the same record still aggregate normally."""
    from tools.aggregate_results import paired_deltas, usable

    assert usable("gmean", 0.5) and usable("l1", 0.0)
    assert not usable("gmean", 0.0) and not usable("gmean", float("nan"))

    records = []
    for arm in ("base", "rrt"):
        for seed, g in ((0, 1.0), (1, 2.0), (2, 0.0 if arm == "rrt" else 3.0)):
            records.append({
                "name": f"{arm}_seed{seed}" if seed else arm,
                "config": {"seed": seed},
                "test": {"gmean": g, "l1": g + 1.0},
                "shots": {"many": {"gmean": g}},
            })
    agg = aggregate(records, "gmean")
    assert agg["rrt"]["all"]["n"] == 2  # seed-2 zero excluded
    np.testing.assert_allclose(agg["rrt"]["all"]["mean"], 1.5)
    assert agg["base"]["all"]["n"] == 3
    # l1 from the same records is untouched
    assert aggregate(records, "l1")["rrt"]["all"]["n"] == 3
    # paired deltas only use the shared non-degenerate seeds
    pd = paired_deltas(records, "base", "gmean")
    assert pd["rrt"]["all"]["n"] == 2
    np.testing.assert_allclose(pd["rrt"]["all"]["deltas"], [0.0, 0.0])


def test_seed_changes_init_not_data():
    """Different seeds give different parameter inits but the identical
    synthetic dataset (so multi-seed comparisons share the data)."""
    import jax

    from imbalanced_regression_tpu.tasks.age import build_data
    from imbalanced_regression_tpu.models.resnet import RegressionHead

    c0 = ExperimentConfig(synthetic_size=32, img_size=16, seed=0)
    c1 = ExperimentConfig(synthetic_size=32, img_size=16, seed=1)
    t0 = build_data(c0)[0]
    t1 = build_data(c1)[0]
    np.testing.assert_array_equal(t0["input"], t1["input"])

    head = RegressionHead()
    p0 = head.init(jax.random.key(c0.seed), np.zeros((1, 8), np.float32))
    p1 = head.init(jax.random.key(c1.seed), np.zeros((1, 8), np.float32))
    assert np.abs(np.asarray(p0["params"]["Dense_0"]["kernel"]) -
                  np.asarray(p1["params"]["Dense_0"]["kernel"])).max() > 0
