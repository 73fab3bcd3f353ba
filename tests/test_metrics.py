"""Shot-metric oracles: sequential reimplementations of the reference
evaluators (imdb-wiki-dir/train.py:338-391, sts-b-dir/util.py:101-171,
nyud2-dir/util.py:35-133)."""

import numpy as np
from scipy.stats import gmean

from imbalanced_regression_tpu.utils.metrics import (
    DepthEvaluator,
    STSShotAverage,
    regression_metrics,
    shot_metrics,
)


def _shot_oracle(preds, labels, train_labels, many_thr=100, low_thr=20):
    train_labels = np.asarray(train_labels).astype(int)
    res = {r: {"mse": [], "l1": [], "g": [], "cnt": []} for r in ("many", "median", "low")}
    for l in np.unique(labels):
        m = labels == l
        tc = int((train_labels == l).sum())
        region = "many" if tc > many_thr else ("low" if tc < low_thr else "median")
        res[region]["mse"].append(np.sum((preds[m] - labels[m]) ** 2))
        res[region]["l1"].append(np.sum(np.abs(preds[m] - labels[m])))
        res[region]["g"].extend(np.abs(preds[m] - labels[m]))
        res[region]["cnt"].append(int(m.sum()))
    out = {}
    for r, d in res.items():
        out[r] = {
            "mse": np.sum(d["mse"]) / np.sum(d["cnt"]),
            "l1": np.sum(d["l1"]) / np.sum(d["cnt"]),
            "gmean": float(gmean(np.hstack(d["g"]))),
        }
    return out


def test_shot_metrics_matches_oracle(rng):
    train_labels = np.concatenate([
        np.repeat(np.arange(20, 30), 150),   # many (>100)
        np.repeat(np.arange(50, 60), 50),    # median
        np.repeat(np.arange(90, 100), 5),    # low (<20)
    ])
    labels = np.concatenate([rng.integers(20, 30, 200), rng.integers(50, 60, 100),
                             rng.integers(90, 100, 50)]).astype(np.float32)
    preds = labels + rng.normal(0, 3, size=labels.shape).astype(np.float32)
    got = shot_metrics(preds, labels, train_labels)
    want = _shot_oracle(preds, labels, train_labels)
    for region in ("many", "median", "low"):
        for k in ("mse", "l1", "gmean"):
            np.testing.assert_allclose(got[region][k], want[region][k], rtol=1e-6)


def test_regression_metrics(rng):
    labels = rng.uniform(0, 100, 500)
    preds = labels + rng.normal(0, 2, 500)
    m = regression_metrics(preds, labels)
    err = np.abs(preds - labels)
    np.testing.assert_allclose(m["mse"], np.mean(err**2), rtol=1e-6)
    np.testing.assert_allclose(m["l1"], np.mean(err), rtol=1e-6)
    np.testing.assert_allclose(m["gmean"], gmean(err), rtol=1e-6)


def test_sts_shot_average(rng):
    scorer = STSShotAverage()
    labels = rng.uniform(0, 5, 300).astype(np.float32)
    preds = (labels / 5.0 + rng.normal(0, 0.05, 300)).astype(np.float32)
    # accumulate in two calls like per-batch scoring
    scorer(preds[:100], labels[:100])
    scorer(preds[100:], labels[100:])
    m = scorer.get_metric()
    # overall MSE on x5-rescaled predictions
    np.testing.assert_allclose(m["overall"]["mse"], np.mean((preds * 5 - labels) ** 2), rtol=1e-5)
    assert m["overall"]["num_samples"] == 300
    assert m["many"]["num_samples"] + m["medium"]["num_samples"] + m["few"]["num_samples"] == 300
    assert 0.9 < m["overall"]["pearsonr"] <= 1.0
    # reset-on-read
    m2 = scorer.get_metric(reset=True)
    scorer(preds[:10], labels[:10])
    assert scorer.get_metric()["overall"]["num_samples"] == 10


def test_sts_overall_type():
    scorer = STSShotAverage()
    scorer(np.array([0.5]), np.array([2.5]))
    out = scorer.get_metric(type="overall")
    assert "mse" in out and "many" not in out


def test_depth_evaluator(rng):
    ev = DepthEvaluator()
    depth = rng.uniform(0.7, 10, size=1000).astype(np.float32)
    out = (depth * rng.uniform(0.9, 1.1, size=1000)).astype(np.float32)
    depth[::50] = np.nan  # nan masking path
    ev(out[:500], depth[:500])
    ev(out[500:], depth[500:])
    m = ev.evaluate_shot()

    valid = ~np.isnan(depth)
    diff = np.abs(out[valid] - depth[valid])
    np.testing.assert_allclose(m["overall"]["MSE"], np.mean(diff**2), rtol=1e-5)
    np.testing.assert_allclose(m["overall"]["RMSE"], np.sqrt(np.mean(diff**2)), rtol=1e-5)
    np.testing.assert_allclose(m["overall"]["MAE"], np.mean(diff), rtol=1e-5)
    ratio = np.maximum(out[valid] / depth[valid], depth[valid] / out[valid])
    np.testing.assert_allclose(m["overall"]["DELTA1"], np.mean(ratio <= 1.25), rtol=1e-5)
    assert m["overall"]["NUM"] == int(valid.sum())
    assert m["many"]["NUM"] + m["medium"]["NUM"] + m["few"]["NUM"] == m["overall"]["NUM"]
