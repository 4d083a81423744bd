"""Pure-numpy neural encoder stack for the mention model (M2-M5).

The sandbox has no torch, so the reference's encoder stack is
re-implemented as deterministic seeded-weight NUMPY inference — the
same architecture and tensor shapes, not a stub:

* ``CharCNN``   — char embeddings -> width-3 same-pad conv -> ReLU ->
  max-pool over positions (reference ``model/charcnn.py:11-78``:
  ``nn.Conv1d(embedding_dim, hidden_dim, kernel_size=3, padding=1)`` +
  ``get_last_hiddens`` max-pool).
* ``WordRep``   — word embedding ⊕ char feature per token (reference
  ``model/wordrep.py:87-135``: ``torch.cat([word_embs, char_features],
  2)``). Word vectors use the hashing trick: each token's embedding is
  drawn from a Philox generator keyed by the portable 60-bit md5 hash
  of the token, so the "vocab" is unbounded and identical on every
  executor with zero broadcast — the property a 10^12-doc web corpus
  needs (no 10^8-row embedding matrix to ship).
* ``TransformerLayer`` — sinusoidal positional encoding, sqrt(d_model)
  embedding scale, multi-head self-attention with a padding mask,
  post-norm Add&Norm, position-wise FFN (reference
  ``model/transformer.py:88-230``: ``PositionWiseFeedForward``,
  ``MultiAttention`` with d_k = d_model/h, ``AddAndNorm``,
  ``PositionalEncoding``, ``TokEmbeddings`` * sqrt(d_model)).
* ``hidden2tag`` — linear d_model -> n_labels emission logits
  (reference ``model/wordsequence.py:72-78``).

Weights come from ``np.random.Generator(np.random.Philox(key=...))``:
Philox is a counter-based, platform-stable PRNG, so every Python worker
on every executor materializes bit-identical weights from a constant —
the executor-local singleton pattern (M11) with nothing to ship. A
trained checkpoint would replace ``_rng`` draws with loaded arrays; the
shapes, masking, and the exact-Viterbi decode on top are unchanged.

Distributed-correctness invariant (pytest ``test_encoder.py``): a
sentence's emission logits do not depend on which Arrow batch,
micro-batch, or padding width it was decoded with — padding is masked
out of the attention softmax, and every per-token feature depends only
on the token itself. Without that property, results would change with
partitioning — the cardinal sin for a distributed operator.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from hebrew_ner_spark.functions.hashing import phash_py
from hebrew_ner_spark.operators.crf import LABELS

# Small-but-real dims: the reference defaults are char_emb 30 /
# char_hidden 50 / word_emb 300 / HP_hidden_dim 200 (utils/data.py HP_*);
# scaled down ~8x so seeded inference stays cheap at corpus scale while
# every architectural element (conv, heads, FFN) keeps its shape algebra.
CHAR_EMB = 8
CHAR_HIDDEN = 8
WORD_EMB = 24
D_MODEL = WORD_EMB + CHAR_HIDDEN  # 32; WordRep concat feeds the encoder
N_HEADS = 2
D_K = D_MODEL // N_HEADS
D_FF = 2 * D_MODEL
MAX_POS = 4096  # positional-encoding table length (ref default 5000)

_SEED_ROOT = 0x5EED_E11C0DE


def _rng(tag: int) -> np.random.Generator:
    """Platform-stable generator for one weight tensor."""
    return np.random.Generator(np.random.Philox(key=_SEED_ROOT + tag))


def _glorot(rng: np.random.Generator, shape: tuple[int, ...]) -> np.ndarray:
    limit = np.sqrt(6.0 / (shape[0] + shape[-1]))
    return rng.uniform(-limit, limit, size=shape)


def _layer_norm(x: np.ndarray, gain: np.ndarray, bias: np.ndarray) -> np.ndarray:
    """LayerNormaliser semantics (model/transformer.py:53-68), eps 1e-5."""
    mu = x.mean(axis=-1, keepdims=True)
    sd = x.std(axis=-1, keepdims=True)
    return gain * (x - mu) / (sd + 1e-5) + bias


def _positional_encoding(max_len: int) -> np.ndarray:
    """Sinusoidal PE table (model/transformer.py:120-149)."""
    pos = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(
        np.arange(0, D_MODEL, 2, dtype=np.float64) * (-np.log(10000.0) / D_MODEL)
    )
    pe = np.zeros((max_len, D_MODEL))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


class CharCNN:
    """M3: char embedding -> conv(k=3, same pad) -> ReLU -> max-pool.

    Char embeddings are hashing-trick rows keyed by codepoint, cached
    per worker (the reference's char alphabet is finite and shipped;
    ours is lazily materialized — same tensor, different residency).
    """

    def __init__(self) -> None:
        self._emb: Dict[int, np.ndarray] = {}
        self.w = _glorot(_rng(10), (3 * CHAR_EMB, CHAR_HIDDEN))
        self.b = _rng(11).normal(0.0, 0.02, CHAR_HIDDEN)

    def _char_rows(self, cps: np.ndarray) -> np.ndarray:
        out = np.empty((len(cps), CHAR_EMB))
        for i, cp in enumerate(cps):
            row = self._emb.get(cp)
            if row is None:
                row = _rng(1_000_000 + int(cp)).normal(0.0, 1.0, CHAR_EMB)
                self._emb[cp] = row
            out[i] = row
        return out

    def features(self, token: str) -> np.ndarray:
        """(CHAR_HIDDEN,) pooled char feature for one token."""
        cps = np.array([ord(c) for c in token], dtype=np.int64)
        if len(cps) == 0:
            cps = np.array([0], dtype=np.int64)
        e = self._char_rows(cps)  # (T, CHAR_EMB)
        # width-3 same-pad conv as an unfolded matmul: window t sees
        # chars (t-1, t, t+1) with zero pads at the borders
        padded = np.zeros((len(cps) + 2, CHAR_EMB))
        padded[1:-1] = e
        windows = np.concatenate(
            [padded[:-2], padded[1:-1], padded[2:]], axis=1
        )  # (T, 3*CHAR_EMB)
        conv = np.maximum(windows @ self.w + self.b, 0.0)  # ReLU
        return conv.max(axis=0)  # max-pool over positions


class WordRep:
    """M2: word embedding (hashing trick) ⊕ CharCNN feature, cached per
    unique token. Per-token features depend ONLY on the token string, so
    they are partition- and batch-invariant by construction."""

    def __init__(self) -> None:
        self.char_cnn = CharCNN()
        self._cache: Dict[str, np.ndarray] = {}

    def _one(self, token: str) -> np.ndarray:
        v = self._cache.get(token)
        if v is None:
            wemb = _rng(2_000_000 + (phash_py(token) % 900_000_000)).normal(
                0.0, 1.0, WORD_EMB
            )
            v = np.concatenate([wemb, self.char_cnn.features(token)])
            self._cache[token] = v
        return v

    def embed(self, padded: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        """(n, max_len) object token batch -> (n, max_len, D_MODEL);
        padded positions are zero vectors. Vectorized over the batch's
        UNIQUE tokens (web text repeats heavily), then one gather."""
        n, max_len = padded.shape
        mask = np.arange(max_len)[None, :] < lengths[:, None]
        toks = padded[mask]
        uniq, inv = np.unique(toks.astype(str), return_inverse=True)
        table = np.stack([self._one(t) for t in uniq]) if len(uniq) else np.zeros(
            (0, D_MODEL)
        )
        out = np.zeros((n, max_len, D_MODEL))
        out[mask] = table[inv]
        return out


class TransformerLayer:
    """M4: one post-norm encoder layer with masked multi-head attention.

    Mirrors model/transformer.py:152-230 (MultiAttention: per-head d_k =
    d_model/heads, scores/sqrt(d_k), mask -> -inf before softmax; then
    AddAndNorm and PositionWiseFeedForward)."""

    def __init__(self) -> None:
        self.wq = _glorot(_rng(20), (D_MODEL, D_MODEL))
        self.wk = _glorot(_rng(21), (D_MODEL, D_MODEL))
        self.wv = _glorot(_rng(22), (D_MODEL, D_MODEL))
        self.wo = _glorot(_rng(23), (D_MODEL, D_MODEL))
        self.ff1 = _glorot(_rng(24), (D_MODEL, D_FF))
        self.ff1_b = _rng(25).normal(0.0, 0.02, D_FF)
        self.ff2 = _glorot(_rng(26), (D_FF, D_MODEL))
        self.ff2_b = _rng(27).normal(0.0, 0.02, D_MODEL)
        self.ln1_g = np.ones(D_MODEL)
        self.ln1_b = np.zeros(D_MODEL)
        self.ln2_g = np.ones(D_MODEL)
        self.ln2_b = np.zeros(D_MODEL)

    def forward(self, x: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        """(n, T, D) -> (n, T, D); positions >= length are masked out of
        every softmax, so valid positions never attend to padding."""
        n, T, _ = x.shape
        valid = np.arange(T)[None, :] < lengths[:, None]  # (n, T)

        def heads(w: np.ndarray) -> np.ndarray:
            # (n, T, D) @ (D, D) -> (n, H, T, d_k)
            return (x @ w).reshape(n, T, N_HEADS, D_K).transpose(0, 2, 1, 3)

        q, k, v = heads(self.wq), heads(self.wk), heads(self.wv)
        scores = q @ k.transpose(0, 1, 3, 2) / np.sqrt(D_K)  # (n, H, T, T)
        scores = np.where(valid[:, None, None, :], scores, -np.inf)
        scores -= scores.max(axis=-1, keepdims=True)  # stable softmax
        w = np.exp(scores)
        attn = w / w.sum(axis=-1, keepdims=True)
        ctx = (attn @ v).transpose(0, 2, 1, 3).reshape(n, T, D_MODEL)
        x = _layer_norm(x + ctx @ self.wo, self.ln1_g, self.ln1_b)
        ff = np.maximum(x @ self.ff1 + self.ff1_b, 0.0) @ self.ff2 + self.ff2_b
        x = _layer_norm(x + ff, self.ln2_g, self.ln2_b)
        # zero the padded tail so downstream consumers can't read
        # garbage norms off pad rows (their values are undefined anyway)
        return np.where(valid[:, :, None], x, 0.0)


class SeededEncoder:
    """M2-M5 stack: WordRep -> scaled + positional -> TransformerLayer
    -> hidden2tag emission logits. Inference only; deterministic."""

    def __init__(self) -> None:
        self.word_rep = WordRep()
        self.layer = TransformerLayer()
        self.pe = _positional_encoding(MAX_POS)
        self.h2t = _glorot(_rng(30), (D_MODEL, len(LABELS)))
        self.h2t_b = _rng(31).normal(0.0, 0.02, len(LABELS))

    def emissions(self, padded: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        """(n, max_len) object tokens -> (n, max_len, n_labels) float64
        logits; rows past each sentence's length are zeros."""
        n, max_len = padded.shape
        if max_len > MAX_POS:
            raise ValueError(
                f"sentence of {max_len} tokens exceeds the positional table "
                f"({MAX_POS}); segment the input first (the reference caps "
                "max_len the same way, model/transformer.py:125)"
            )
        x = self.word_rep.embed(padded, lengths) * np.sqrt(D_MODEL)
        x = x + self.pe[None, :max_len, :]
        h = self.layer.forward(x, lengths)
        logits = h @ self.h2t + self.h2t_b
        valid = np.arange(max_len)[None, :] < lengths[:, None]
        return np.where(valid[:, :, None], logits, 0.0)

    # -- test support: independent slow path -------------------------------
    def emissions_slow(self, tokens: List[str]) -> np.ndarray:
        """Per-position loop reference for ONE sentence (no batching, no
        einsum): the independent model the vectorized path is tested
        against. Kept in the product module so the parity test can't
        drift from the production weights."""
        T = len(tokens)
        x = np.stack([self.word_rep._one(t) for t in tokens]) * np.sqrt(D_MODEL)
        x = x + self.pe[:T]
        q = x @ self.layer.wq
        k = x @ self.layer.wk
        v = x @ self.layer.wv
        ctx = np.zeros_like(x)
        for h in range(N_HEADS):
            sl = slice(h * D_K, (h + 1) * D_K)
            for i in range(T):
                s = np.array([q[i, sl] @ k[j, sl] for j in range(T)]) / np.sqrt(D_K)
                s -= s.max()
                w = np.exp(s)
                w /= w.sum()
                ctx[i, sl] = sum(w[j] * v[j, sl] for j in range(T))
        x1 = _layer_norm(x + ctx @ self.layer.wo, self.layer.ln1_g, self.layer.ln1_b)
        ff = (
            np.maximum(x1 @ self.layer.ff1 + self.layer.ff1_b, 0.0) @ self.layer.ff2
            + self.layer.ff2_b
        )
        x2 = _layer_norm(x1 + ff, self.layer.ln2_g, self.layer.ln2_b)
        return x2 @ self.h2t + self.h2t_b
