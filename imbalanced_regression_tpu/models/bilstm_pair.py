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
    """Stacked bidirectional LSTM; each layer concatenates fwd/bwd outputs.

    Straightforward ``flax.linen.RNN`` formulation — kept for checkpoints
    written before round 4 (see :class:`FusedBiLSTM`, the default)."""

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


def flip_padded(x, lengths):
    """Reverse each row's valid prefix along time, leaving trailing padding
    in place — the packed-sequence reversal (torch ``pack_padded_sequence``
    semantics; what ``flax.linen.RNN(reverse=True, keep_order=True,
    seq_lengths=...)`` does internally). Involutive: applying twice restores
    the input."""
    t = jnp.arange(x.shape[1])[None, :]
    src = jnp.where(t < lengths[:, None], lengths[:, None] - 1 - t, t)
    return jnp.take_along_axis(x, src[..., None], axis=1)


def _block_orthogonal(key, shape, dtype=jnp.float32):
    """Four per-gate orthogonal (H, H) blocks — the distribution
    ``OptimizedLSTMCell``'s ``recurrent_kernel_init`` draws per gate."""
    h, four_h = shape
    assert four_h == 4 * h, shape
    keys = jax.random.split(key, 4)
    blocks = [nn.initializers.orthogonal()(k, (h, h), dtype) for k in keys]
    return jnp.concatenate(blocks, axis=-1)


class FusedBiLSTM(nn.Module):
    """TPU-optimized stacked BiLSTM, numerically equivalent to
    :class:`BiLSTM` (same i,f,g,o gate math as ``flax.linen.LSTMCell``).

    At the reference width (d_hid=1500, ``sts-b-dir/train.py:54``) the naive
    formulation is the STS-B step's bottleneck: 2 layers x 2 directions x 2
    sentences = 8 separate 40-step ``lax.scan``s of small matmuls, each
    launching an input projection AND a recurrent matmul per step. This
    module restructures the computation for the MXU:

    - **input projections hoisted out of the scan**: ``x @ W_i + b`` for all
      timesteps is one [B*L, D] x [D, 4H] matmul (the cuDNN trick) — only
      the recurrent ``h @ W_h`` stays sequential;
    - **both directions in one scan**: the backward direction consumes the
      packed-reversed sequence (:func:`flip_padded`), so fwd and bwd are
      rows of a single doubled batch — one scan per layer instead of two,
      with twice the rows per recurrent matmul;
    - **f32 cell state with bf16 matmuls**: gates are computed in the module
      dtype (bf16 on TPU) while c/h accumulate in f32 — the standard
      mixed-precision recurrence.

    The per-gate parameter layout differs from the flax cells, so
    checkpoints written with ``BiLSTM`` need ``lstm_impl='flax'``."""

    hidden_size: int
    n_layers: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, lengths):
        h_dim = self.hidden_size
        n_rows = x.shape[0]
        for layer in range(self.n_layers):
            xx = jnp.concatenate([x, flip_padded(x, lengths)], axis=0)  # [2B,L,D]
            xw = nn.Dense(4 * h_dim, dtype=self.dtype,
                          name=f"input_proj_{layer}")(xx)
            wh = self.param(f"recurrent_kernel_{layer}", _block_orthogonal,
                            (h_dim, 4 * h_dim), jnp.float32)
            whd = wh.astype(self.dtype)

            def step(carry, xt, whd=whd):
                c, h = carry
                gates = (xt + h.astype(whd.dtype) @ whd).astype(jnp.float32)
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
                h = jax.nn.sigmoid(o) * jnp.tanh(c)
                return (c, h), h

            zeros = jnp.zeros((xx.shape[0], h_dim), jnp.float32)
            _, hs = jax.lax.scan(step, (zeros, zeros), jnp.swapaxes(xw, 0, 1))
            hs = jnp.swapaxes(hs, 0, 1)  # [2B, L, H] f32
            out_f, out_b_rev = hs[:n_rows], hs[n_rows:]
            out_b = flip_padded(out_b_rev, lengths)
            x = jnp.concatenate([out_f, out_b], axis=-1).astype(self.dtype)
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
    lstm_impl: str = "fused"  # 'fused' (TPU-optimized) | 'flax' (pre-round-4 ckpts)
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
        lstm_cls = {"fused": FusedBiLSTM, "flax": BiLSTM}[self.lstm_impl]
        self.bilstm = lstm_cls(self.d_hid, self.n_layers, dtype=self.dtype)
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
        # both sentences ride one doubled batch through the encoder: rows are
        # independent, so results match per-sentence encoding exactly (eval);
        # in train mode only the dropout pattern differs (same distribution).
        # Halves the scan count and doubles every matmul's row tile. The two
        # sentence columns may be padded to different lengths (each batch
        # pads per column) — right-pad to the longer one; extra positions
        # carry mask 0, so lengths and the masked max-pool are unaffected.
        L = max(batch["tokens1"].shape[1], batch["tokens2"].shape[1])
        pad = lambda a: jnp.pad(a, ((0, 0), (0, L - a.shape[1])))  # noqa: E731
        toks = jnp.concatenate([pad(batch["tokens1"]), pad(batch["tokens2"])], axis=0)
        mask = jnp.concatenate([pad(batch["mask1"]), pad(batch["mask2"])], axis=0)
        enc = self.encode(toks, mask, train)
        s1, s2 = jnp.split(enc, 2, axis=0)
        return jnp.concatenate([s1, s2, jnp.abs(s1 - s2), s1 * s2], axis=1)
