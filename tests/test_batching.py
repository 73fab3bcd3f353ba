"""Batching edge cases: nested dicts, drop-last, padding, infinite generator."""

import numpy as np

from imbalanced_regression_tpu.data.batching import (
    batch_iterator,
    eval_batches,
    infinite_batches,
)


def _data(n=10):
    return {
        "input": {"a": np.arange(n * 2).reshape(n, 2), "b": np.arange(n)},
        "target": np.arange(n, dtype=np.float32)[:, None],
    }


def test_drop_last():
    batches = list(batch_iterator(_data(10), 4, shuffle=False))
    assert len(batches) == 2
    assert batches[0]["input"]["a"].shape == (4, 2)


def test_shuffle_deterministic():
    a = [b["target"] for b in batch_iterator(_data(10), 5, rng=np.random.default_rng(1))]
    b = [b["target"] for b in batch_iterator(_data(10), 5, rng=np.random.default_rng(1))]
    np.testing.assert_array_equal(np.concatenate(a), np.concatenate(b))


def test_nested_selection_consistent():
    for batch in batch_iterator(_data(10), 5, rng=np.random.default_rng(0)):
        # leaves must be selected with the same permutation
        np.testing.assert_array_equal(batch["input"]["b"], batch["target"][:, 0].astype(int))


def test_eval_padding():
    batches = list(eval_batches(_data(10), 4))
    assert [b["count"] for b in batches] == [4, 4, 2]
    last = batches[-1]
    assert last["target"].shape == (4, 1)  # padded to full batch
    np.testing.assert_array_equal(last["target"][2:], last["target"][:1].repeat(2, 0))


def test_infinite_batches_epochs():
    gen = infinite_batches(_data(10), 5, seed=0)
    epochs = [next(gen)[1] for _ in range(5)]
    assert epochs == [0, 0, 1, 1, 2]


def test_infinite_batches_restart_is_exact():
    # a generator restarted at batch k reproduces the uninterrupted stream
    # (the basis for exact STS resume; reference is best-effort only)
    ref = infinite_batches(_data(10), 5, seed=7)
    stream = [next(ref)[0]["target"] for _ in range(9)]
    resumed = infinite_batches(_data(10), 5, seed=7, start_batches=5)
    for k in range(5, 9):
        np.testing.assert_array_equal(next(resumed)[0]["target"], stream[k])


def test_infinite_batches_reshuffles_each_epoch():
    gen = infinite_batches(_data(10), 5, seed=3)
    e0 = np.concatenate([next(gen)[0]["target"].ravel() for _ in range(2)])
    e1 = np.concatenate([next(gen)[0]["target"].ravel() for _ in range(2)])
    assert sorted(e0) == sorted(e1)
    assert not np.array_equal(e0, e1)


def test_infinite_index_batches_matches_infinite_batches():
    """The index generator and the gathering generator must emit the SAME
    shuffle stream (shared index_iterator), including mid-epoch restarts —
    device-resident index batching and host batching are interchangeable."""
    import numpy as np

    from imbalanced_regression_tpu.data.batching import (
        infinite_batches,
        infinite_index_batches,
    )

    data = {"x": np.arange(50, dtype=np.int64), "y": np.arange(50) * 2.0}
    for start in (0, 7):
        g1 = infinite_batches(data, 8, seed=3, start_batches=start)
        g2 = infinite_index_batches(50, 8, seed=3, start_batches=start)
        for _ in range(15):
            b, e1 = next(g1)
            idx, e2 = next(g2)
            assert e1 == e2
            np.testing.assert_array_equal(b["x"], data["x"][idx])
            np.testing.assert_array_equal(b["y"], data["y"][idx])
