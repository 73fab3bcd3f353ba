"""GloVe + BiLSTM sentence-pair encoder for STS-B (TPU-native).

Re-design of the reference's AllenNLP stack (``sts-b-dir/models.py:16-166``):
Embedding (padding idx 0, optionally frozen) → Highway (0 layers by default)
→ 2-layer bidirectional LSTM (d_hid=1500/direction) → masked max-pool →
pair features ``[s1; s2; |s1-s2|; s1*s2]`` (12000-d). The final Linear lives
in :class:`models.resnet.RegressionHead` so FDS can calibrate the pair
embedding in between (``models.py:89-92``).

TPU notes: the LSTM runs as ``flax.linen.RNN`` (``lax.scan`` under jit) with
``seq_lengths``-aware reversal for the backward direction — equivalent to
torch's packed-sequence handling (states never see padding in either
direction's valid region). Sequence length is 40, so scan cost is trivial;
the heavy compute is the 12000-d head and 3000-wide gates, which map to the
MXU. Masked max-pool uses a -inf fill in float32 (``models.py:161-163``)."""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp


class Highway(nn.Module):
    """y = g * relu(W1 x) + (1 - g) * x, g = sigmoid(W2 x) (AllenNLP Highway)."""

    n_layers: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        for _ in range(self.n_layers):
            proj = nn.Dense(2 * d, dtype=self.dtype)(x)
            nonlin, gate = jnp.split(proj, 2, axis=-1)
            g = jax.nn.sigmoid(gate)
            x = g * nn.relu(nonlin) + (1.0 - g) * x
        return x


class BiLSTM(nn.Module):
    """Stacked bidirectional LSTM; each layer concatenates fwd/bwd outputs."""

    hidden_size: int
    n_layers: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, lengths):
        for _ in range(self.n_layers):
            fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size, dtype=self.dtype))
            bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size, dtype=self.dtype))
            out_f = fwd(x, seq_lengths=lengths)
            out_b = bwd(x, seq_lengths=lengths, reverse=True, keep_order=True)
            x = jnp.concatenate([out_f, out_b], axis=-1)
        return x


class PairBiLSTMEncoder(nn.Module):
    """Sentence-pair encoder producing the 4-way pair embedding."""

    vocab_size: int
    d_word: int = 300
    d_hid: int = 1500
    n_layers: int = 2
    n_highway: int = 0
    dropout: float = 0.2
    dropout_embs: float = 0.2
    train_words: bool = False
    embedding_table: Any = None  # optional np.ndarray [vocab, d_word]
    dtype: Any = jnp.float32

    def setup(self):
        if self.embedding_table is not None:
            table = jnp.asarray(self.embedding_table)
            init: Callable = lambda key, shape, dtype=jnp.float32: table
        else:
            init = nn.initializers.normal(1.0)
        self.embed = nn.Embed(self.vocab_size, self.d_word, embedding_init=init,
                              param_dtype=jnp.float32)
        self.highway = Highway(self.n_highway, dtype=self.dtype)
        self.bilstm = BiLSTM(self.d_hid, self.n_layers, dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout)
        self.drop_embs = nn.Dropout(self.dropout_embs)

    def encode(self, tokens, mask, train: bool):
        embs = self.embed(tokens)
        if not self.train_words:
            # frozen GloVe (train_words=0 default, models.py:25-31)
            embs = jax.lax.stop_gradient(embs)
        embs = self.highway(embs)
        embs = self.drop_embs(embs, deterministic=not train)
        lengths = jnp.sum(mask, axis=1).astype(jnp.int32)
        enc = self.bilstm(embs.astype(self.dtype), lengths)
        enc = self.drop(enc, deterministic=not train)
        # masked max-pool with -inf fill (models.py:159-163)
        enc = jnp.where(mask[..., None] > 0, enc.astype(jnp.float32), -jnp.inf)
        return jnp.max(enc, axis=1)

    def __call__(self, batch, train: bool):
        s1 = self.encode(batch["tokens1"], batch["mask1"], train)
        s2 = self.encode(batch["tokens2"], batch["mask2"], train)
        return jnp.concatenate([s1, s2, jnp.abs(s1 - s2), s1 * s2], axis=1)
