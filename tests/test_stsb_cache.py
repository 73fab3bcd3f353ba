"""STS-B preprocessing cache: hit on second load, invalidation on change."""

import numpy as np

from imbalanced_regression_tpu.data.stsb import load_stsb_datasets

HEADER = "index\tgenre\tfilename\tyear\told_index\tsource1\tsource2\tsentence1\tsentence2\tscore\n"


def _write_tsvs(root, n=12, shift=0.0):
    for name in ("train_new.tsv", "dev_new.tsv", "test_new.tsv"):
        with open(root / name, "w") as fh:
            fh.write(HEADER)
            for i in range(n):
                score = min(5.0, (i % 6) + shift)
                fh.write(f"{i}\tg\tf\ty\to\ts\ts\tthe cat sat {i}\ta dog ran {i}\t{score}\n")


class Cfg:
    max_seq_len = 10
    max_word_v_size = 100
    word_embs_file = ""
    d_word = 8
    bucket_num = 50
    bucket_start = 0
    reweight = "none"
    lds = False
    lds_kernel = "gaussian"
    lds_ks = 5
    lds_sigma = 2.0


def test_cache_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("HOME", str(tmp_path / "home"))
    _write_tsvs(tmp_path)
    train1, _, _, emb1, vocab1 = load_stsb_datasets(str(tmp_path), Cfg())
    # second load hits the cache and produces identical arrays
    train2, _, _, emb2, vocab2 = load_stsb_datasets(str(tmp_path), Cfg())
    np.testing.assert_array_equal(train1["input"]["tokens1"], train2["input"]["tokens1"])
    np.testing.assert_array_equal(train1["target"], train2["target"])
    assert vocab1 == vocab2
    cache_dir = tmp_path / "home" / ".cache" / "imbalanced_regression_tpu"
    assert len(list(cache_dir.glob("stsb_*.pkl"))) == 1

    # changing the data invalidates the key (new cache entry, new targets)
    _write_tsvs(tmp_path, shift=0.5)
    train3, _, _, _, _ = load_stsb_datasets(str(tmp_path), Cfg())
    assert not np.array_equal(train1["target"], train3["target"])
    assert len(list(cache_dir.glob("stsb_*.pkl"))) == 2
