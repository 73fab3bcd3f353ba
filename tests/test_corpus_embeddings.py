"""tools/corpus_embeddings: PPMI+SVD corpus-internal embedding pretraining
(the zero-egress GloVe stand-in, see the module docstring)."""

import numpy as np

from tools.corpus_embeddings import (
    build_corpus_embeddings,
    cooccurrence_counts,
    ppmi_matrix,
    write_glove_format,
)

# toy corpus with two tight co-occurrence clusters: {cat, dog, pet} and
# {car, road, drive} — vectors must reflect the cluster structure
SENTS = (
    [["the", "cat", "is", "a", "pet"], ["the", "dog", "is", "a", "pet"],
     ["cat", "and", "dog", "play"], ["a", "pet", "cat"], ["a", "pet", "dog"],
     ["the", "car", "on", "the", "road"], ["drive", "the", "car"],
     ["drive", "on", "the", "road"], ["car", "and", "road"],
     ["drive", "a", "car", "on", "a", "road"]] * 3
)


def test_cooccurrence_counts_window_and_weighting():
    words, counts = cooccurrence_counts([["a", "b", "c"]], window=2, min_count=1)
    assert words == ["a", "b", "c"]
    ia, ib, ic = 0, 1, 2
    assert counts[(ia, ib)] == 1.0  # adjacent: weight 1/1
    assert counts[(ia, ic)] == 0.5  # distance 2: weight 1/2
    assert counts[(ia, ib)] == counts[(ib, ia)]  # symmetric


def test_min_count_filters_rare_words():
    words, _ = cooccurrence_counts([["a", "a", "b"]], window=2, min_count=2)
    assert words == ["a"]


def test_ppmi_nonnegative_and_zero_diag_behavior():
    _, counts = cooccurrence_counts(SENTS, window=5, min_count=2)
    n = max(max(i, j) for i, j in counts) + 1
    m = ppmi_matrix(n, counts)
    assert np.all(m >= 0.0)
    assert np.all(np.isfinite(m))


def test_embeddings_deterministic_and_cluster_structure():
    words, emb = build_corpus_embeddings(SENTS, dim=16, min_count=2,
                                         target_norm=5.0, seed=0)
    words2, emb2 = build_corpus_embeddings(SENTS, dim=16, min_count=2,
                                           target_norm=5.0, seed=0)
    assert words == words2
    np.testing.assert_allclose(emb, emb2)  # deterministic (fixed svds v0)

    idx = {w: i for i, w in enumerate(words)}
    norm = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-9)
    cos = lambda a, b: float(norm[idx[a]] @ norm[idx[b]])  # noqa: E731
    # within-cluster similarity beats cross-cluster for the anchor pairs
    assert cos("cat", "dog") > cos("cat", "road")
    assert cos("car", "road") > cos("dog", "car")

    # mean row norm matches target_norm
    norms = np.linalg.norm(emb, axis=1)
    assert abs(norms.mean() - 5.0) < 1e-3


def test_glove_format_roundtrip(tmp_path):
    from imbalanced_regression_tpu.data.stsb import load_glove

    words, emb = build_corpus_embeddings(SENTS, dim=8, min_count=2, seed=0)
    out = tmp_path / "vecs.txt"
    write_glove_format(str(out), words, emb)

    vocab = {"@@PADDING@@": 0, "@@UNKNOWN@@": 1}
    for w in words:
        vocab[w] = len(vocab)
    table = load_glove(vocab, str(out), d_word=8)
    for w in words:
        np.testing.assert_allclose(table[vocab[w]], emb[words.index(w)],
                                   atol=1e-4)  # %.5f text round-trip
    np.testing.assert_array_equal(table[0], 0.0)
