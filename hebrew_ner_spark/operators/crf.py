"""Linear-chain CRF decoding: exact Viterbi max-DP (M7) and k-best (M8).

Reference parity: ``model/crf.py:104-265`` (``_viterbi_decode``: per-step
max over previous states with backpointers, length-masked, START/STOP
boundary transitions) and ``model/crf.py:267-437``
(``_viterbi_decode_nbest``: per-state top-k partitions), invoked from the
predict path at ``ncrf_main.py:172-178``. The sandbox has no torch, so the
weight tensor is a **deterministic seeded integer model** derived from the
portable 60-bit md5 hash (functions/hashing.py):

    emission(token, label) = phash('E|token|label') mod 1,000,003
    transition(l1, l2)     = phash('T|l1|l2')      mod 1,000,003
    start(l) / end(l)      = phash('S|l') / phash('F|l') mod 1,000,003

Every transition differs, so the best path genuinely depends on the DP —
a per-position argmax decodes differently — and integer scores make the
whole decode exact in every engine: the DuckDB oracle verifies it against
brute-force enumeration of all 5^T paths over short sentences
(querydefs/mentions_q.py), the same closed-form strategy as the lattice
oracles.

Ordering contract (ties CAN happen — sums of ~11 bounded hashes collide):
paths rank by (score DESC, label sequence ASC front-lexicographically).
This order is extension-invariant (appending the same suffix preserves
both keys), so per-state top-k beam pruning is exact, not approximate.

Scale shape: decoding is embarrassingly parallel — one ``mapInPandas``
over token arrays, executor-local model singleton (M11), zero shuffles.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LABELS = ["O", "B-TERM", "I-TERM", "E-TERM", "S-TERM"]
LABEL_IDX = {l: i for i, l in enumerate(LABELS)}
SCORE_MOD = 1_000_003
NBEST_K = 3

_CRF = None  # executor-local singleton (M11 pattern)


def _phash(s: str) -> int:
    """Portable 60-bit md5 hash, seed 0 — identical in Spark SQL, DuckDB
    and Python (single source: functions/hashing.py phash_py)."""
    from hebrew_ner_spark.functions.hashing import phash_py

    return phash_py(s)


class SeededCRF:
    """Deterministic integer CRF: hash-seeded weights, exact decoding.

    A neural drop-in replaces ``emission_row`` with model logits and the
    weight tables with learned tensors; the DP below is unchanged.
    """

    def __init__(self, labels: List[str] | None = None) -> None:
        self.labels = list(labels or LABELS)
        L = len(self.labels)
        self.trans = [
            [_phash(f"T|{a}|{b}") % SCORE_MOD for b in self.labels]
            for a in self.labels
        ]
        self.start = [_phash(f"S|{l}") % SCORE_MOD for l in self.labels]
        self.end = [_phash(f"F|{l}") % SCORE_MOD for l in self.labels]
        self.n_labels = L
        self._em_cache: dict[str, List[int]] = {}

    def emission_row(self, token: str) -> List[int]:
        row = self._em_cache.get(token)
        if row is None:
            row = [_phash(f"E|{token}|{l}") % SCORE_MOD for l in self.labels]
            self._em_cache[token] = row
        return row

    def decode_nbest(
        self, tokens: List[str], k: int = NBEST_K
    ) -> List[Tuple[int, Tuple[int, ...]]]:
        """Top-k label paths for one sentence: [(score, label_idx_path)].

        Beam-exact k-best Viterbi: each state (t, label) keeps its top-k
        (score, path) candidates under the global ordering; ordering is
        extension-invariant so pruning loses nothing
        (model/crf.py:267-437 semantics with explicit paths instead of
        normalized backpointer indexes).
        """
        if not tokens:
            return []
        L = self.n_labels
        em0 = self.emission_row(tokens[0])
        beams: List[List[Tuple[int, Tuple[int, ...]]]] = [
            [(self.start[l] + em0[l], (l,))] for l in range(L)
        ]
        for t in range(1, len(tokens)):
            em = self.emission_row(tokens[t])
            new_beams = []
            for l in range(L):
                cands = [
                    (s + self.trans[pl][l] + em[l], p + (l,))
                    for pl in range(L)
                    for (s, p) in beams[pl]
                ]
                cands.sort(key=lambda sp: (-sp[0], sp[1]))
                new_beams.append(cands[:k])
            beams = new_beams
        final = [
            (s + self.end[p[-1]], p) for l in range(L) for (s, p) in beams[l]
        ]
        final.sort(key=lambda sp: (-sp[0], sp[1]))
        return final[:k]

    def decode(self, tokens: List[str]) -> Tuple[int, Tuple[int, ...]]:
        """M7: the exact 1-best Viterbi path under the same global
        (score DESC, front-lex ASC) order as decode_nbest, computed
        without per-candidate tuple churn: one backward suffix-max DP,
        then a greedy forward pass picking the smallest label that still
        completes to the optimum — integer-only, O(T*L^2), several-fold
        cheaper than the k-best beam in the full-corpus hot path."""
        if not tokens:
            return (0, ())
        T, L = len(tokens), self.n_labels
        ems = [self.emission_row(t) for t in tokens]
        # best[t][l] = max score of a suffix starting at t in state l
        # (emission at t included; end transition at T-1)
        suf = [ems[T - 1][l] + self.end[l] for l in range(L)]
        hist = [suf]
        for t in range(T - 2, -1, -1):
            trans = self.trans
            em = ems[t]
            suf = [
                em[l] + max(trans[l][j] + suf[j] for j in range(L))
                for l in range(L)
            ]
            hist.append(suf)
        hist.reverse()  # hist[t][l]
        total = max(self.start[l] + hist[0][l] for l in range(L))
        path: List[int] = []
        acc, prev = 0, -1
        for t in range(T):
            for l in range(L):
                step = self.start[l] if t == 0 else self.trans[prev][l]
                if acc + step + hist[t][l] == total:
                    path.append(l)
                    acc += step + ems[t][l]
                    prev = l
                    break
        return (total, tuple(path))


def _get_crf() -> SeededCRF:
    global _CRF
    if _CRF is None:
        _CRF = SeededCRF()
    return _CRF


def viterbi_decode_batch(
    scores: np.ndarray,
    lengths: np.ndarray,
    trans: np.ndarray,
    start: np.ndarray,
    end: np.ndarray,
) -> np.ndarray:
    """Batched float Viterbi over padded emission tensors — the tensor
    form of M7 used by the mention-model slot (mentions._Model.decode):
    ``scores`` (n, max_len, L), returns (n, max_len) best-path indexes
    (padded tail undefined). Max-DP with backpointers, mirroring
    model/crf.py:104-265 without the START/STOP padding columns. Ties
    break BACKWARD-greedily (per-step argmax-first-occurrence from the
    final state), which is the reference's behaviour but NOT the global
    front-lex order of SeededCRF. The production mention model's uniform
    B/I/E/S emissions DO produce ties, and the mention_model_labels /
    _binned oracles pin exactly this backward-greedy order (min
    little-endian path integer over label indexes) — changing the tie
    convention here is an observable, gate-breaking change.
    """
    n, max_len, L = scores.shape
    dp = start[None, :] + scores[:, 0, :]
    bps = np.zeros((n, max_len, L), dtype=np.int64)
    dp_hist = np.empty((n, max_len, L), dtype=np.float64)
    dp_hist[:, 0, :] = dp
    for t in range(1, max_len):
        # cand[b, i, j] = dp[b, i] + trans[i, j]
        cand = dp[:, :, None] + trans[None, :, :]
        bps[:, t, :] = cand.argmax(axis=1)
        dp = cand.max(axis=1) + scores[:, t, :]
        dp_hist[:, t, :] = dp
    # backtrace, vectorized across the batch (a per-sentence Python loop
    # here costs O(n * max_len) interpreter iterations — measurably the
    # hot spot at corpus scale)
    out = np.zeros((n, max_len), dtype=np.int64)
    rows = np.arange(n)
    lengths = np.asarray(lengths, dtype=np.int64)
    nonzero = lengths > 0
    last_t = np.maximum(lengths - 1, 0)
    ptr = (dp_hist[rows, last_t, :] + end[None, :]).argmax(axis=1)
    out[rows[nonzero], last_t[nonzero]] = ptr[nonzero]
    for t in range(max_len - 1, 0, -1):
        active = lengths > t  # rows whose path includes step t
        if not active.any():
            continue
        stepped = bps[rows, t, ptr]
        ptr = np.where(active, stepped, ptr)
        out[active, t - 1] = ptr[active]
    return out


def viterbi_labels_tensor(toks_df: DataFrame) -> DataFrame:
    """(doc_id, toks) -> (doc_id, word_index, token, label) through the
    BATCHED FLOAT TENSOR decoder (viterbi_decode_batch — the exact code
    path the mention-model slot runs), with the seeded integer weights
    as float64 tensors. Integer-valued floats < 2^53 make every compare
    exact, so the gate verifies the tensor DP itself against exhaustive
    enumeration. Ties resolve backward-greedily (smallest last label,
    then smallest backpointer), i.e. minimum REVERSE-lexicographic path
    among optima — the oracle ranks by (score DESC, little-endian path
    integer ASC), which is that exact order."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        crf = _get_crf()
        L = crf.n_labels
        trans = np.array(crf.trans, dtype=np.float64)
        start = np.array(crf.start, dtype=np.float64)
        end = np.array(crf.end, dtype=np.float64)
        for pdf in batches:
            toks_list = [list(t) for t in pdf["toks"]]
            if not toks_list:
                continue
            lengths = np.array([len(t) for t in toks_list], dtype=np.int64)
            max_len = max(1, int(lengths.max()))
            scores = np.zeros((len(toks_list), max_len, L), dtype=np.float64)
            for i, toks in enumerate(toks_list):
                for t, tok in enumerate(toks):
                    scores[i, t, :] = crf.emission_row(tok)
            idx = viterbi_decode_batch(scores, lengths, trans, start, end)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"]
                    .repeat([len(t) for t in toks_list])
                    .astype("int64")
                    .values,
                    "word_index": np.concatenate(
                        [np.arange(len(t), dtype=np.int64) for t in toks_list]
                    ),
                    "token": [tok for t in toks_list for tok in t],
                    "label": [
                        crf.labels[idx[i, t]]
                        for i, t_list in enumerate(toks_list)
                        for t in range(len(t_list))
                    ],
                }
            )

    return toks_df.mapInPandas(
        run, "doc_id long, word_index long, token string, label string"
    )


def viterbi_labels(toks_df: DataFrame) -> DataFrame:
    """(doc_id, toks) -> (doc_id, word_index, token, label): exact 1-best
    CRF decode per document. One mapInPandas, no shuffles."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        crf = _get_crf()
        for pdf in batches:
            doc_ids, widx, toks, labs = [], [], [], []
            for doc_id, tlist in zip(pdf["doc_id"], pdf["toks"]):
                tokens = list(tlist)
                _, path = crf.decode(tokens)
                for i, (tok, l) in enumerate(zip(tokens, path)):
                    doc_ids.append(doc_id)
                    widx.append(i)
                    toks.append(tok)
                    labs.append(crf.labels[l])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "word_index": pd.Series(widx, dtype="int64"),
                    "token": pd.Series(toks, dtype="object"),
                    "label": pd.Series(labs, dtype="object"),
                }
            )

    return toks_df.mapInPandas(
        run, "doc_id long, word_index long, token string, label string"
    )


def nbest_labels(toks_df: DataFrame, k: int = NBEST_K) -> DataFrame:
    """(doc_id, toks) -> (doc_id, rank, word_index, token, label,
    path_score): the k best label paths per document, rank 1 = Viterbi.
    ``path_score`` is the exact integer path score (constant per
    (doc_id, rank)) — the S11 sink derives its score header from it."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        crf = _get_crf()
        for pdf in batches:
            cols: dict[str, list] = {
                "doc_id": [], "rank": [], "word_index": [],
                "token": [], "label": [], "path_score": [],
            }
            for doc_id, tlist in zip(pdf["doc_id"], pdf["toks"]):
                tokens = list(tlist)
                for r, (score, path) in enumerate(crf.decode_nbest(tokens, k), 1):
                    for i, (tok, l) in enumerate(zip(tokens, path)):
                        cols["doc_id"].append(doc_id)
                        cols["rank"].append(r)
                        cols["word_index"].append(i)
                        cols["token"].append(tok)
                        cols["label"].append(crf.labels[l])
                        cols["path_score"].append(score)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(cols["doc_id"], dtype="int64"),
                    "rank": pd.Series(cols["rank"], dtype="int64"),
                    "word_index": pd.Series(cols["word_index"], dtype="int64"),
                    "token": pd.Series(cols["token"], dtype="object"),
                    "label": pd.Series(cols["label"], dtype="object"),
                    "path_score": pd.Series(cols["path_score"], dtype="int64"),
                }
            )

    return toks_df.mapInPandas(
        run,
        "doc_id long, rank long, word_index long, token string, "
        "label string, path_score long",
    )
