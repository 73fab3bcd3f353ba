"""STS-B resume parity: a run killed after k validation checks and resumed
must make the SAME stopping decision (iteration count, metric history, test
result) as an uninterrupted run.

The reference persists the full metric history in ``metric_state.th``
(``sts-b-dir/trainer.py:357-363``) and restores it (``trainer.py:398-402``);
its data fast-forward is best-effort (``trainer.py:393-396``). Our resume
restores the history AND the exact data position (per-epoch-seeded shuffles),
so the resumed run is bit-identical."""

import dataclasses
import os

import numpy as np
import pytest

from imbalanced_regression_tpu.tasks.stsb import STSConfig, run

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]


def _write_tiny_tsvs(data_dir, n_train=24, n_eval=8, seed=0):
    """GLUE STS-B layout: 10 columns, s1/s2/score at indices 7/8/9, 1 header
    row (the layout load_tsv expects, sts-b-dir/tasks.py:13-35)."""
    rng = np.random.default_rng(seed)
    os.makedirs(data_dir, exist_ok=True)

    def rows(n):
        out = []
        for i in range(n):
            s1 = " ".join(rng.choice(WORDS, rng.integers(3, 7)))
            s2 = " ".join(rng.choice(WORDS, rng.integers(3, 7)))
            score = float(np.round(rng.uniform(0, 5), 3))
            out.append("\t".join(["x"] * 7 + [s1, s2, str(score)]))
        return out

    for fname, n in (("train_new.tsv", n_train), ("dev_new.tsv", n_eval), ("test_new.tsv", n_eval)):
        with open(os.path.join(data_dir, fname), "w") as fh:
            fh.write("header\n" + "\n".join(rows(n)) + "\n")


def _tiny_config(data_dir, store_root, **overrides):
    cfg = STSConfig(
        data_dir=data_dir, store_root=store_root,
        d_word=8, d_hid=8, n_layers_enc=1, n_layers_highway=0,
        dropout=0.2, dropout_embs=0.2, glove=0, max_seq_len=8,
        batch_size=8, val_interval=2, max_vals=8, patience=2, lr=1e-2,
    )
    return dataclasses.replace(cfg, **overrides)


@pytest.mark.slow
def test_resume_matches_uninterrupted(tmp_path):
    data_dir = str(tmp_path / "data")
    _write_tiny_tsvs(data_dir)

    # uninterrupted run: 8 val checks max
    full = run(_tiny_config(data_dir, str(tmp_path / "full")))

    # interrupted run: the max_vals=2 cap emulates a kill after 2 val checks
    part_root = str(tmp_path / "part")
    cfg_part = _tiny_config(data_dir, part_root, max_vals=2)
    partial = run(cfg_part)
    assert partial["iterations"] == 2 * cfg_part.val_interval
    store_dir = os.path.join(part_root, cfg_part.derived_store_name())
    assert os.path.isfile(os.path.join(store_dir, "metric_state.json"))

    # resume with the full budget -> identical stopping decision and history
    resumed = run(_tiny_config(data_dir, part_root, resume=store_dir))
    assert resumed["iterations"] == full["iterations"]
    assert resumed["best_val_mse"] == pytest.approx(full["best_val_mse"], rel=1e-6)
    assert resumed["test"]["overall"]["mse"] == pytest.approx(
        full["test"]["overall"]["mse"], rel=1e-6)


def test_metric_state_roundtrip(tmp_path):
    from imbalanced_regression_tpu.utils.checkpoint import (
        load_metric_state,
        save_metric_state,
    )

    d = str(tmp_path / "ck")
    assert load_metric_state(d) is None
    save_metric_state(d, [1.5, 1.2, 1.3], 1.2, is_best=True)
    save_metric_state(d, [1.5, 1.2, 1.3, 1.4], 1.2, is_best=False)
    assert load_metric_state(d, "latest")["hist"] == [1.5, 1.2, 1.3, 1.4]
    assert load_metric_state(d, "best")["hist"] == [1.5, 1.2, 1.3]
    assert load_metric_state(d, "best")["best"] == 1.2


def test_export_predictions_clamped(tmp_path):
    from imbalanced_regression_tpu.tasks.stsb import export_predictions

    preds = np.array([-0.3, 0.1, 0.5, 0.9, 1.4])  # model scale (targets/5)
    labels = np.array([0.0, 0.5, 2.5, 4.5, 5.0])
    path = export_predictions(str(tmp_path), "sts", preds, labels)
    out = np.load(path)
    # x5 rescale then clamp to [0, 5] (sts-b-dir/evaluate.py:41)
    np.testing.assert_allclose(out["preds"], [0.0, 0.5, 2.5, 4.5, 5.0])
    np.testing.assert_allclose(out["labels"], labels)
