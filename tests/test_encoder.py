"""M2-M5 numpy encoder stack: parity, invariance, legality, plan shape.

No SQL oracle can replay a transformer, so the value-level guarantees
for detect_mentions_neural live here:

* the vectorized batched path equals an independent per-position-loop
  reference implementation (same weights, different algebra);
* a sentence's logits/labels are invariant to batch composition,
  padding width, micro-batch grouping, and Spark partitioning — the
  distributed-correctness property;
* every decoded sequence is BIOSE-legal while the per-position argmax
  is NOT (the CRF decode is load-bearing, not decoration);
* the Spark plan is one mapInPandas with zero shuffles.
"""

from __future__ import annotations

import numpy as np
import pytest

from hebrew_ner_spark.operators.encoder import MAX_POS, SeededEncoder
from hebrew_ner_spark.operators.mentions import (
    _label_batch,
    _NeuralModel,
)

SENTS = [
    "שלום עולם זה מבחן",
    "foo bar baz",
    "לחתום על חוזה מס הכנסה בנק ישראל",
    "x",
    'מלים עם "גרשיים" וגם מספרים 123 ו-45.6',
]


@pytest.fixture(scope="module")
def enc():
    return SeededEncoder()


@pytest.fixture(scope="module")
def model():
    return _NeuralModel()


def _pad(sents: list[list[str]]):
    lengths = np.array([len(s) for s in sents], dtype=np.int64)
    width = int(lengths.max())
    padded = np.full((len(sents), width), "", dtype=object)
    for i, s in enumerate(sents):
        padded[i, : len(s)] = s
    return padded, lengths


def test_vectorized_matches_independent_slow_path(enc):
    toks = [s.split() for s in SENTS]
    padded, lengths = _pad(toks)
    fast = enc.emissions(padded, lengths)
    for i, s in enumerate(toks):
        slow = enc.emissions_slow(s)
        assert np.allclose(fast[i, : len(s)], slow, atol=1e-12), SENTS[i]


def test_batch_and_padding_invariance(enc):
    s = SENTS[2].split()
    alone = enc.emissions(*_pad([s]))[0, : len(s)]
    # same sentence inside a batch padded 3x wider by a longer neighbour
    neighbour = ["pad"] * (3 * len(s))
    mixed = enc.emissions(*_pad([neighbour, s]))[1, : len(s)]
    assert np.allclose(alone, mixed, atol=1e-9)
    # padded tail is exactly zero, not garbage
    wide = enc.emissions(*_pad([neighbour, s]))
    assert np.abs(wide[1, len(s) :]).max() == 0.0


def test_weights_deterministic_across_instances():
    a, b = SeededEncoder(), SeededEncoder()
    s = SENTS[0].split()
    assert np.array_equal(a.emissions(*_pad([s])), b.emissions(*_pad([s])))


def test_positional_table_guard(enc):
    padded = np.full((1, MAX_POS + 1), "x", dtype=object)
    with pytest.raises(ValueError, match="positional table"):
        enc.emissions(padded, np.array([MAX_POS + 1]))


def _legal(labels: list[str]) -> bool:
    allow = {
        "O": {"O", "B-TERM", "S-TERM"},
        "B-TERM": {"I-TERM", "E-TERM"},
        "I-TERM": {"I-TERM", "E-TERM"},
        "E-TERM": {"O", "B-TERM", "S-TERM"},
        "S-TERM": {"O", "B-TERM", "S-TERM"},
    }
    if labels[0] not in ("O", "B-TERM", "S-TERM"):
        return False
    if labels[-1] not in ("O", "E-TERM", "S-TERM"):
        return False
    return all(b in allow[a] for a, b in zip(labels, labels[1:]))


def test_viterbi_legal_where_argmax_is_not(model):
    toks = [np.array(s.split(), dtype=object) for s in SENTS]
    flat, lengths = _label_batch(toks, model)
    offs = np.concatenate([[0], np.cumsum(lengths)])
    argmax_illegal = 0
    for i in range(len(toks)):
        seq = flat[offs[i] : offs[i + 1]].tolist()
        assert _legal(seq), (SENTS[i], seq)
        padded, ls = _pad([toks[i].tolist()])
        am_idx = model.scores(padded, ls)[0, : len(toks[i])].argmax(axis=1)
        from hebrew_ner_spark.operators.crf import LABELS

        if not _legal([LABELS[j] for j in am_idx]):
            argmax_illegal += 1
    # the CRF must be load-bearing on this fixture: at least one sentence
    # where the per-position shortcut emits an illegal sequence
    assert argmax_illegal >= 1


def test_micro_batch_grouping_invariance(model):
    # decoding each sentence alone must equal decoding them together
    # (length-sort + shared-pad + inverse permutation must not leak)
    toks = [np.array(s.split(), dtype=object) for s in SENTS]
    together, lengths = _label_batch(toks, model)
    offs = np.concatenate([[0], np.cumsum(lengths)])
    for i, t in enumerate(toks):
        alone, _ = _label_batch([t], model)
        assert alone.tolist() == together[offs[i] : offs[i + 1]].tolist()


def test_detect_mentions_neural_end_to_end(spark, sf_dir):
    from hebrew_ner_spark.operators import kg, mentions
    from hebrew_ner_spark.sources.catalog import load_table

    # filter, not limit: a global limit adds a single-partition exchange
    # that would pollute the zero-shuffle plan assertion below
    docs = load_table(spark, sf_dir, "documents").where("doc_id < 40")
    out = mentions.detect_mentions_neural(docs)
    rows = out.collect()
    n_tokens = (
        kg.with_tokens(docs).selectExpr("size(toks) n").groupBy().sum("n").first()[0]
    )
    assert len(rows) == n_tokens
    # partition invariance: the distributed result is a pure function of
    # the data, not of how it was split across tasks
    again = set(
        map(tuple, mentions.detect_mentions_neural(docs.repartition(7)).collect())
    )
    assert set(map(tuple, rows)) == again
    # zero shuffles: embarrassingly parallel stage
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.replace("repartition", "")


def test_neural_invariants_golden():
    """Recompute NEURAL_GOLDEN_SF001 with NO Spark: per-sentence decodes
    (batch-of-1 — proven equal to the batched path above) + pure-python
    md5 checksum. If the encoder, the CRF seed, the tokenization, or the
    checksum convention drifts, this fails before the pinned VALUES
    oracle can go silently stale (VERDICT r3 #2)."""
    import hashlib

    import pandas as pd

    from hebrew_ner_spark.operators import mentions
    from hebrew_ner_spark.querydefs.mentions_q import NEURAL_GOLDEN_SF001

    MOD, SEED = mentions.NEURAL_INV_MOD, mentions.NEURAL_INV_SEED
    docs = pd.read_parquet("/root/testdata/sf0.01/documents.parquet")[
        ["doc_id", "text"]
    ]
    model = mentions._get_neural_model()
    B, I, E, S = "B-TERM", "I-TERM", "E-TERM", "S-TERM"
    counts = {l[0]: 0 for l in mentions.LABELS}
    n_ill = n_spans = chk = 0
    for doc_id, text in zip(docs.doc_id, docs.text):
        toks = np.array(text.split(" "), dtype=object)
        labels = list(mentions._label_batch([toks], model)[0])
        for wi, lb in enumerate(labels):
            counts[lb[0]] += 1
            prev = labels[wi - 1] if wi > 0 else None
            nxt = labels[wi + 1] if wi + 1 < len(labels) else None
            n_ill += int(
                (prev is None and lb in (I, E))
                or (prev in (B, I) and lb not in (I, E))
                or (prev in (E, S, "O") and lb in (I, E))
                or (nxt is None and lb in (B, I))
            )
            n_spans += int(lb in (B, S))
            chk += (
                int(
                    hashlib.md5(
                        f"{doc_id}:{wi}:{lb}:{SEED}".encode()
                    ).hexdigest()[:15],
                    16,
                )
                % MOD
            )
    got = {f"n_{k}": v for k, v in counts.items()}
    got.update(n_illegal=n_ill, n_spans=n_spans, checksum=chk % MOD)
    assert got == NEURAL_GOLDEN_SF001
