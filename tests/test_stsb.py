"""STS-B pipeline + model tests. Uses the real STS-B-DIR TSVs when available
(the reference ships them); synthetic token data otherwise."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imbalanced_regression_tpu.data.stsb import (
    PAD_IDX,
    UNK_IDX,
    build_vocab,
    index_and_pad,
    load_glove,
    load_tsv,
)
from imbalanced_regression_tpu.models.bilstm_pair import BiLSTM, PairBiLSTMEncoder

STS_DIR = "/root/reference/sts-b-dir/glue_data/STS-B"


def test_vocab_conventions():
    vocab = build_vocab([[["a", "b", "a"], ["b", "a"]]], max_vocab_size=10)
    assert vocab["@@PADDING@@"] == PAD_IDX and vocab["@@UNKNOWN@@"] == UNK_IDX
    assert vocab["a"] == 2  # most frequent first
    assert vocab["b"] == 3


def test_vocab_cap():
    sents = [[[f"w{i}" for i in range(100)]]]
    vocab = build_vocab(sents, max_vocab_size=10)
    assert len(vocab) == 12  # pad + unk + 10


def test_index_and_pad():
    vocab = {"@@PADDING@@": 0, "@@UNKNOWN@@": 1, "hello": 2}
    tokens, mask = index_and_pad([["hello", "unseen"]], vocab, max_seq_len=4)
    np.testing.assert_array_equal(tokens[0], [2, 1, 0, 0])
    np.testing.assert_array_equal(mask[0], [1, 1, 0, 0])


def test_glove_fallback_random(tmp_path):
    vocab = {"@@PADDING@@": 0, "@@UNKNOWN@@": 1, "cat": 2}
    table = load_glove(vocab, str(tmp_path / "missing.txt"), d_word=8)
    assert table.shape == (3, 8)
    np.testing.assert_array_equal(table[0], 0.0)  # pad row zeroed

    glove = tmp_path / "glove.txt"
    glove.write_text("cat " + " ".join(["0.5"] * 8) + "\n")
    table2 = load_glove(vocab, str(glove), d_word=8)
    np.testing.assert_allclose(table2[2], 0.5)


@pytest.mark.skipif(not os.path.exists(STS_DIR), reason="STS-B data not present")
def test_load_real_tsv():
    s1, s2, targs = load_tsv(os.path.join(STS_DIR, "dev_new.tsv"), max_seq_len=40)
    assert len(s1) == len(s2) == len(targs)
    assert len(targs) == 1000  # balanced dev split (create_sts.py)
    assert all(0.0 <= t <= 5.0 for t in targs)
    assert all(1 <= len(s) <= 40 for s in s1)


def test_bilstm_respects_lengths(rng):
    """Backward direction must not see padding: outputs at valid positions are
    invariant to junk in padded positions (packed-sequence parity)."""
    model = BiLSTM(hidden_size=8, n_layers=1)
    x = rng.normal(size=(2, 6, 4)).astype(np.float32)
    lengths = jnp.asarray([3, 6])
    params = model.init(jax.random.key(0), jnp.asarray(x), lengths)
    out1 = model.apply(params, jnp.asarray(x), lengths)
    x2 = x.copy()
    x2[0, 3:] = 99.0  # junk in padding of the first sequence
    out2 = model.apply(params, jnp.asarray(x2), lengths)
    np.testing.assert_allclose(np.asarray(out1[0, :3]), np.asarray(out2[0, :3]),
                               rtol=1e-5, atol=1e-6)


def test_fused_bilstm_matches_numpy_oracle(rng):
    """FusedBiLSTM (hoisted input projections, one scan for both directions)
    against an independent numpy LSTM with packed-sequence reversal — the
    i,f,g,o gate math of flax's LSTMCell, which itself mirrors torch's
    (what the reference's AllenNLP encoder wraps, sts-b-dir/models.py:137)."""
    from imbalanced_regression_tpu.models.bilstm_pair import FusedBiLSTM, flip_padded

    B, L, D, H = 3, 7, 5, 4
    x = rng.normal(size=(B, L, D)).astype(np.float32)
    lengths = np.asarray([3, 7, 5], np.int32)
    model = FusedBiLSTM(hidden_size=H, n_layers=1, dtype=jnp.float32)
    params = model.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(lengths))
    got = np.asarray(model.apply(params, jnp.asarray(x), jnp.asarray(lengths)))

    Wi = np.asarray(params["params"]["input_proj_0"]["kernel"])
    b = np.asarray(params["params"]["input_proj_0"]["bias"])
    Wh = np.asarray(params["params"]["recurrent_kernel_0"])
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))  # noqa: E731

    def run_dir(xin):
        h = np.zeros((B, H)); c = np.zeros((B, H)); outs = []
        for t in range(L):
            gates = xin[:, t] @ Wi + b + h @ Wh
            i, f, g, o = np.split(gates, 4, axis=-1)
            c = sig(f) * c + sig(i) * np.tanh(g)
            h = sig(o) * np.tanh(c)
            outs.append(h)
        return np.stack(outs, 1)

    def flip_np(v):
        out = v.copy()
        for bi, n in enumerate(lengths):
            out[bi, :n] = v[bi, :n][::-1]
        return out

    want = np.concatenate([run_dir(x), flip_np(run_dir(flip_np(x)))], axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # flip_padded agrees with the numpy flip and is involutive
    fp = np.asarray(flip_padded(jnp.asarray(x), jnp.asarray(lengths)))
    np.testing.assert_array_equal(fp, flip_np(x))
    np.testing.assert_array_equal(
        np.asarray(flip_padded(jnp.asarray(fp), jnp.asarray(lengths))), x)


def test_fused_bilstm_respects_lengths(rng):
    """Packed-sequence parity for the fused path: valid-position outputs are
    invariant to junk in padded positions (cf. the BiLSTM test above)."""
    from imbalanced_regression_tpu.models.bilstm_pair import FusedBiLSTM

    model = FusedBiLSTM(hidden_size=8, n_layers=2, dtype=jnp.float32)
    x = rng.normal(size=(2, 6, 4)).astype(np.float32)
    lengths = jnp.asarray([3, 6])
    params = model.init(jax.random.key(0), jnp.asarray(x), lengths)
    out1 = model.apply(params, jnp.asarray(x), lengths)
    x2 = x.copy()
    x2[0, 3:] = 99.0
    out2 = model.apply(params, jnp.asarray(x2), lengths)
    np.testing.assert_allclose(np.asarray(out1[0, :3]), np.asarray(out2[0, :3]),
                               rtol=1e-5, atol=1e-6)


def test_pair_encoder_batched_sentences_match_separate(rng):
    """The doubled-batch sentence encoding must equal per-sentence encoding
    in eval mode (rows are independent)."""
    enc = PairBiLSTMEncoder(vocab_size=30, d_word=8, d_hid=6, n_layers=1,
                            dropout=0.0, dropout_embs=0.0)
    toks = rng.integers(2, 30, size=(4, 9)).astype(np.int32)
    lens = rng.integers(3, 10, size=(4,))
    mask = (np.arange(9)[None, :] < lens[:, None]).astype(np.float32)
    batch = {"tokens1": jnp.asarray(toks), "mask1": jnp.asarray(mask),
             "tokens2": jnp.asarray(toks), "mask2": jnp.asarray(mask)}
    params = enc.init(jax.random.key(0), batch, train=False)
    out = np.asarray(enc.apply(params, batch, train=False))
    s1, s2, diff, prod = np.split(out, 4, axis=1)
    np.testing.assert_array_equal(s1, s2)  # identical sentences, same rows
    np.testing.assert_array_equal(diff, 0.0)
    np.testing.assert_allclose(prod, s1 * s1, rtol=1e-6)


def test_pair_encoder_shapes(rng):
    enc = PairBiLSTMEncoder(vocab_size=50, d_word=8, d_hid=16, n_layers=2, dropout=0.2)
    batch = {
        "tokens1": jnp.asarray(rng.integers(2, 50, size=(4, 10)).astype(np.int32)),
        "mask1": jnp.asarray((rng.random((4, 10)) > 0.3).astype(np.float32)),
        "tokens2": jnp.asarray(rng.integers(2, 50, size=(4, 10)).astype(np.int32)),
        "mask2": jnp.asarray((rng.random((4, 10)) > 0.3).astype(np.float32)),
    }
    # ensure every sentence has at least one valid token
    batch["mask1"] = batch["mask1"].at[:, 0].set(1.0)
    batch["mask2"] = batch["mask2"].at[:, 0].set(1.0)
    params = enc.init(jax.random.key(0), batch, train=False)
    out = enc.apply(params, batch, train=False)
    assert out.shape == (4, 2 * 16 * 4)
    assert np.all(np.isfinite(np.asarray(out)))
    # frozen embeddings: gradient through embed is zero
    def loss(p):
        return jnp.sum(enc.apply(p, batch, train=False) ** 2)
    g = jax.grad(loss)(params)
    emb_grad = g["params"]["embed"]["embedding"]
    np.testing.assert_array_equal(np.asarray(emb_grad), 0.0)


def test_pair_encoder_glove_init(rng):
    table = rng.normal(size=(20, 8)).astype(np.float32)
    enc = PairBiLSTMEncoder(vocab_size=20, d_word=8, d_hid=4, n_layers=1,
                            embedding_table=table)
    batch = {k: jnp.ones((1, 3), jnp.int32 if "tokens" in k else jnp.float32)
             for k in ("tokens1", "mask1", "tokens2", "mask2")}
    params = enc.init(jax.random.key(0), batch, train=False)
    np.testing.assert_allclose(np.asarray(params["params"]["embed"]["embedding"]), table)


def test_is_new_best_requires_strict_improvement():
    """Reference _check_history (sts-b-dir/trainer.py:59-62): best only when
    the best score's first index is the last history element."""
    from imbalanced_regression_tpu.tasks.stsb import is_new_best

    assert is_new_best([1.0])                    # first check is always best
    assert is_new_best([2.0, 1.0])               # strict improvement
    assert not is_new_best([1.0, 2.0])           # worse
    assert not is_new_best([1.0, 1.0])           # tie with an earlier check
    assert not is_new_best([2.0, 1.0, 1.0])      # tie with the current best
    assert is_new_best([2.0, 1.5, 1.0])
