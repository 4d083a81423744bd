"""Mention detection as a batched Arrow model-inference stage (M1-M11).

This is the engine's neural-labeller slot. The reference's predict path
(predict_text, ner_app.py:183-194 -> evaluate, ncrf_main.py:139-194) is:

    batchify + length-sort (M1/O1)  ->  forward pass (M2-M5)
    ->  Viterbi decode (M7)         ->  inverse-permutation + label
                                        recover (M10)

Spark disposition (SURVEY.md §2.8): the WHOLE chain is one ``mapInPandas``
over token arrays with

* an **executor-local lazily-loaded model singleton** per Python worker
  (M11/M12; ner_app.py:34-61 preloads once per process — with
  spark.python.worker.reuse=true the cost amortizes identically);
* **length-sorted micro-batches** inside each Arrow batch (O1,
  ncrf_main.py:253-277): sort sentences by token count, pad to the
  micro-batch max, recover original order by inverse permutation;
* a **batched Viterbi max-DP decode** (M7, crf.viterbi_decode_batch)
  over emission scores under hard BIOSE transition legality.

The sandbox has no torch, so the "model" is deterministic — but NOT
degenerate: entity tokens emit UNIFORM mass over B/I/E/S (a per-position
argmax cannot segment a run; it would pick an illegal all-B sequence),
and the transition tensor is BIOSE legality PLUS the hash-seeded integer
CRF weights (operators/crf.py SeededCRF), so the batched Viterbi max-DP
genuinely decides how each maximal entity run splits into mentions
(S vs B-E vs B-I-E ... segmentations score differently). All weights are
integer-valued float64 (exact in IEEE), which keeps the stage
oracle-checkable: feasible paths decompose per entity run, so the DuckDB
oracle enumerates every legal segmentation of every run (2^(n-1) cut
masks) and must reproduce the decode exactly, ties included
(querydefs/mentions_q.py). Swapping in a neural checkpoint changes only
`_Model.scores` and the weight tables.
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hebrew_ner_spark.operators import kg
from hebrew_ner_spark.resources import ENTITY_TERMS

# single source of truth for the label space — the legality tensors below
# index into the same order the decoder's emission columns use
from hebrew_ner_spark.operators.crf import LABEL_IDX as _LABEL_IDX
from hebrew_ner_spark.operators.crf import LABELS
# HP_batch_size analog (utils/data.py:96, default 10). Larger than the
# reference default: sentences are length-sorted first, so padding waste
# stays low while each micro-batch amortizes the per-step numpy dispatch
# of the Viterbi DP over 256 lanes.
MICRO_BATCH = 256

_MODEL = None  # executor-local singleton (M11 pattern)


# Illegal-move mass. One illegal step must never be bought back by the
# seeded weights (< 2^20 ~ 1e6 per step), so a sentence of T tokens —
# whose maximum legal transition gain is ~T*1e6 — is safe only while
# T*1e6 << 1e15. _MAX_SENT guards that bound explicitly at T <= 1e7:
# max legal gain ~1e13, two orders below the wall, and every partial sum
# (wall + gains < 1.1e15) stays an exactly-representable float64 integer
# (< 2^53 ~ 9e15). The guard is per SENTENCE (the decode unit), so a
# 100 TB corpus never trips it on document size — only on a single
# pathological unsegmented sentence, which must fail loudly rather than
# silently decode a BIOSE-illegal path.
_NEG = -1.0e15
_MAX_SENT = 10_000_000


def _biose_legality() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(trans, start, end) float matrices: 0 for legal BIOSE moves,
    _NEG for illegal — the hard-constraint transition tensor the seeded
    (or a trained) CRF adds its weights onto."""
    allow = {
        "O": ("O", "B-TERM", "S-TERM"),
        "B-TERM": ("I-TERM", "E-TERM"),
        "I-TERM": ("I-TERM", "E-TERM"),
        "E-TERM": ("O", "B-TERM", "S-TERM"),
        "S-TERM": ("O", "B-TERM", "S-TERM"),
    }
    L = len(LABELS)
    trans = np.full((L, L), _NEG)
    for a, bs in allow.items():
        for b in bs:
            trans[_LABEL_IDX[a], _LABEL_IDX[b]] = 0.0
    start = np.full(L, _NEG)
    end = np.full(L, _NEG)
    for l in ("O", "B-TERM", "S-TERM"):
        start[_LABEL_IDX[l]] = 0.0
    for l in ("O", "E-TERM", "S-TERM"):
        end[_LABEL_IDX[l]] = 0.0
    return trans, start, end


class _Model:
    """Deterministic-but-non-degenerate model + real Viterbi decode.

    Emissions look only at the token itself: an entity token puts 0 on
    each of B/I/E/S and _NEG on O; any other token the reverse. The
    emission argmax is therefore AMBIGUOUS on every entity token — the
    structure (which run positions are B/I/E/S, where mentions split)
    exists only in the transition tensor: BIOSE legality plus the
    hash-seeded integer CRF weights (SeededCRF). The batched max-DP
    (crf.viterbi_decode_batch, M7) is load-bearing: a per-position argmax
    decodes an illegal constant sequence. Swapping in learned logits +
    trained transitions changes only these tensors, not the decode.
    """

    def __init__(self) -> None:
        from hebrew_ner_spark.operators.crf import SeededCRF

        self.ents = frozenset(ENTITY_TERMS)
        # prepared once: np.isin against a ready array beats rebuilding a
        # python list per Arrow batch in the corpus-scale hot path
        self._ents_arr = np.array(sorted(self.ents), dtype=object)
        self._labels_arr = np.array(LABELS, dtype=object)
        trans, start, end = _biose_legality()
        seeded = SeededCRF()
        # integer weights as float64: every partial sum stays exact
        self.trans = trans + np.array(seeded.trans, dtype=np.float64)
        self.start = start + np.array(seeded.start, dtype=np.float64)
        self.end = end + np.array(seeded.end, dtype=np.float64)

    def scores(self, batch: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        """(n, max_len, n_labels) emission scores for a padded token batch."""
        n, max_len = batch.shape
        out = np.full((n, max_len, len(LABELS)), _NEG, dtype=np.float64)
        is_ent = np.isin(batch, self._ents_arr) & (
            np.arange(max_len)[None, :] < lengths[:, None]
        )
        out[..., _LABEL_IDX["O"]] = np.where(is_ent, _NEG, 0.0)
        for lbl in ("B-TERM", "I-TERM", "E-TERM", "S-TERM"):
            out[..., _LABEL_IDX[lbl]] = np.where(is_ent, 0.0, _NEG)
        return out

    def decode_idx(self, scores: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        """M7: batched Viterbi max-DP (model/crf.py:104-265 semantics);
        (n, max_len) label indexes, padded tail undefined."""
        from hebrew_ner_spark.operators.crf import viterbi_decode_batch

        return viterbi_decode_batch(
            scores.astype(np.float64), lengths, self.trans, self.start, self.end
        )

    def decode(self, scores: np.ndarray, lengths: np.ndarray) -> List[List[str]]:
        """decode_idx mapped to label strings, truncated to true length.
        The index->label mapping is one fancy index over the whole batch,
        never a per-token Python loop."""
        lab = self._labels_arr[self.decode_idx(scores, lengths)]
        return [lab[i, : lengths[i]].tolist() for i in range(len(lengths))]


def _get_model() -> _Model:
    global _MODEL
    if _MODEL is None:
        # a neural drop-in loads weights from SparkFiles here, once per
        # reused python worker (ner_app.py:51-57 / ncrf_main.py:506-517)
        _MODEL = _Model()
    return _MODEL


class _NeuralModel(_Model):
    """The M2-M5 drop-in: emissions come from the pure-numpy seeded
    encoder stack (operators/encoder.py — WordRep ⊕ CharCNN ->
    transformer layer -> hidden2tag), exactly the swap the _Model
    docstring promises. Transitions are BIOSE legality plus the seeded
    CRF weights scaled to emission magnitude (O(1) floats), so the
    decode is a real float Viterbi over real logits — the production
    shape of the reference's predict path (ncrf_main.py:139-194) minus
    only the trained parameter values the sandbox cannot hold."""

    def __init__(self) -> None:
        super().__init__()
        from hebrew_ner_spark.operators.crf import SCORE_MOD, SeededCRF
        from hebrew_ner_spark.operators.encoder import SeededEncoder

        self.encoder = SeededEncoder()
        trans, start, end = _biose_legality()
        seeded = SeededCRF()
        scale = 1.0 / SCORE_MOD  # integer weights -> [0, 1) floats
        self.trans = trans + np.array(seeded.trans, dtype=np.float64) * scale
        self.start = start + np.array(seeded.start, dtype=np.float64) * scale
        self.end = end + np.array(seeded.end, dtype=np.float64) * scale

    def scores(self, batch: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        return self.encoder.emissions(batch, lengths)


_NEURAL_MODEL = None


def _get_neural_model() -> _NeuralModel:
    global _NEURAL_MODEL
    if _NEURAL_MODEL is None:
        _NEURAL_MODEL = _NeuralModel()
    return _NEURAL_MODEL


def _label_batch(
    toks_list: List[np.ndarray], model: "_Model | None" = None
) -> tuple[np.ndarray, np.ndarray]:
    """O1/M1: length-sort, pad, score, decode, inverse-permute.

    Returns (flat_labels, lengths): one object array of label strings
    aligned with the concatenation of ``toks_list`` in ORIGINAL order.
    Per-sentence Python touches rows, never tokens — all per-token work
    (emissions, DP, index->label mapping, flattening) is vectorized,
    which is what keeps this stage scaling linearly with cores (a
    per-token loop here measurably drags 4->16-core efficiency)."""
    if model is None:
        model = _get_model()
    lengths = np.array([len(t) for t in toks_list], dtype=np.int64)
    if len(lengths) and int(lengths.max()) > _MAX_SENT:
        raise ValueError(
            f"sentence of {int(lengths.max())} tokens exceeds _MAX_SENT="
            f"{_MAX_SENT}: beyond it the -1e15 illegality wall no longer "
            "dominates the seeded transition gains and Viterbi could emit "
            "a BIOSE-illegal path; segment the input first"
        )
    offs = np.zeros(len(toks_list) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offs[1:])
    flat = np.empty(int(offs[-1]), dtype=object)
    perm = np.argsort(-lengths, kind="stable")  # descending, like the reference
    for start in range(0, len(perm), MICRO_BATCH):
        chunk = perm[start : start + MICRO_BATCH]
        chunk_lens = lengths[chunk]
        max_len = max(1, int(chunk_lens.max()) if len(chunk_lens) else 1)
        padded = np.full((len(chunk), max_len), "", dtype=object)
        for r, src in enumerate(chunk):
            padded[r, : lengths[src]] = toks_list[src]
        lab = model._labels_arr[
            model.decode_idx(model.scores(padded, chunk_lens), chunk_lens)
        ]
        # inverse permutation (M10 word_seq_recover): write each decoded
        # row back to its source sentence's slice of the flat output
        for r, src in enumerate(chunk):
            flat[offs[src] : offs[src + 1]] = lab[r, : lengths[src]]
    return flat, lengths


def _labelled_batches(
    batches: Iterator[pd.DataFrame], get_model=None
) -> Iterator[pd.DataFrame]:
    """Shared mapInPandas kernel: token arrays -> long NER table
    (NER_DF_COLUMNS analog, utils/ner.py:14), fully vectorized."""
    empty_obj = np.array([], dtype=object)
    model = (get_model or _get_model)()
    for pdf in batches:
        toks_list = list(pdf["toks"])
        flat_labels, lengths = _label_batch(toks_list, model)
        n = int(lengths.sum())
        starts = np.repeat(np.cumsum(lengths) - lengths, lengths)
        yield pd.DataFrame(
            {
                "doc_id": np.repeat(pdf["doc_id"].to_numpy(np.int64), lengths),
                "word_index": np.arange(n, dtype=np.int64) - starts,
                "token": np.concatenate(
                    [np.asarray(t, dtype=object) for t in toks_list]
                )
                if n
                else empty_obj,
                "label": flat_labels,
            }
        )


def detect_mentions(docs: DataFrame) -> DataFrame:
    """pages -> (doc_id, word_index, token, label) through the model UDF.

    mapInPandas: each Arrow batch is labelled locally; output explodes to
    the long NER table. The plan has zero shuffles — mention detection is
    embarrassingly parallel.
    """
    toks = kg.with_tokens(docs).select("doc_id", "toks")
    return toks.mapInPandas(
        _labelled_batches, "doc_id long, word_index long, token string, label string"
    )


def detect_mentions_neural(docs: DataFrame) -> DataFrame:
    """detect_mentions with the M2-M5 numpy encoder in the model slot:
    WordRep(word-hash emb ⊕ CharCNN) -> transformer layer -> hidden2tag
    logits -> the SAME batched float Viterbi. Identical plan shape (one
    mapInPandas, zero shuffles); only the executor-local singleton
    differs. No SQL oracle can replay a transformer, so the registry
    gates this rows-only; the value-level guarantees live in pytest
    (vectorized == independent slow path; batch/partition invariance;
    BIOSE legality; CRF is load-bearing vs per-position argmax)."""
    toks = kg.with_tokens(docs).select("doc_id", "toks")

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        return _labelled_batches(batches, _get_neural_model)

    return toks.mapInPandas(
        _kernel, "doc_id long, word_index long, token string, label string"
    )


# --- value-bearing invariants for the neural decode (VERDICT r3 #2) --------
#
# No SQL replays a transformer, but the decode's OUTPUT is still a
# deterministic function of the corpus — so the gate hashes a summary
# that pins the exact per-row label assignment: per-label histogram,
# BIOSE-legality violation count (must be 0 — the Viterbi's hard
# constraint), mention-span count, and a positional md5 checksum over
# (doc_id, word_index, label). Any single label flip anywhere moves the
# checksum; the pinned golden is recomputed INDEPENDENTLY by the pytest
# slow path (pure-python md5 over the per-sentence slow encoder).

NEURAL_INV_MOD = 1_000_000_007
NEURAL_INV_SEED = 97


def neural_invariants(docs: DataFrame) -> DataFrame:
    """(metric, value): 8-row invariant summary of the neural decode.

    Scale shape: the decode stage stays the zero-shuffle mapInPandas;
    on top sit one doc-keyed window (lag/lead for transition legality —
    doc-grain partitions, never global) and one scalar aggregate with
    map-side partials. Checksum arithmetic: per-row hash reduced mod
    ~1e9 before summing, so the int64 running sum holds past 10^9
    tokens per partial; the final mod is applied once."""
    from pyspark.sql import Window

    from hebrew_ner_spark.functions.hashing import phash_col

    B, I, E, S = "B-TERM", "I-TERM", "E-TERM", "S-TERM"
    out = detect_mentions_neural(docs)
    w = Window.partitionBy("doc_id").orderBy("word_index")
    lab = out.withColumn("_prev", F.lag("label").over(w)).withColumn(
        "_next", F.lead("label").over(w)
    )
    ill = (
        (F.col("_prev").isNull() & F.col("label").isin(I, E))
        | (F.col("_prev").isin(B, I) & ~F.col("label").isin(I, E))
        | (F.col("_prev").isin(E, S, "O") & F.col("label").isin(I, E))
        | (F.col("_next").isNull() & F.col("label").isin(B, I))
    )
    h = (
        phash_col(
            F.concat_ws(":", "doc_id", "word_index", "label"), NEURAL_INV_SEED
        )
        % NEURAL_INV_MOD
    )
    z = F.lit(0).cast("long")
    agg = lab.agg(
        *[
            F.coalesce(F.sum((F.col("label") == l).cast("long")), z).alias(
                f"n_{l[0]}"
            )
            for l in LABELS
        ],
        F.coalesce(F.sum(ill.cast("long")), z).alias("n_illegal"),
        F.coalesce(F.sum(F.col("label").isin(B, S).cast("long")), z).alias(
            "n_spans"
        ),
        (F.coalesce(F.sum(h), z) % NEURAL_INV_MOD).alias("checksum"),
    )
    pairs = ", ".join(
        f"'{m}', CAST({m} AS BIGINT)"
        for m in [f"n_{l[0]}" for l in LABELS]
        + ["n_illegal", "n_spans", "checksum"]
    )
    return agg.selectExpr(f"stack(8, {pairs}) AS (metric, value)")


def detect_mentions_length_binned(docs: DataFrame) -> DataFrame:
    """Same stage with plan-level length binning (O1 at the physical
    level): repartitionByRange on token count co-locates similar lengths,
    cutting padding waste inside each Arrow batch. Catalyst never makes
    this choice for us (SURVEY.md §4 row 1)."""
    toks = kg.with_tokens(docs).select(
        "doc_id", "toks", F.size("toks").alias("_len")
    )
    # partition count from spark.sql.shuffle.partitions (a literal count
    # here would pin a 10^12-doc corpus to a handful of tasks)
    binned = toks.repartitionByRange(F.col("_len")).drop("_len")
    return binned.mapInPandas(
        _labelled_batches, "doc_id long, word_index long, token string, label string"
    )
