"""Production mention-model tests: the Viterbi must be load-bearing.

The model emits uniform mass over B/I/E/S on entity tokens, so ONLY the
transition tensor (BIOSE legality + seeded CRF weights) determines how
each entity run segments into mentions — a per-position argmax cannot
produce a legal labeling at all.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hebrew_ner_spark.operators import kg, mentions

SF = "/root/testdata/sf0.001"

_LEGAL_NEXT = {
    "O": {"O", "B-TERM", "S-TERM"},
    "B-TERM": {"I-TERM", "E-TERM"},
    "I-TERM": {"I-TERM", "E-TERM"},
    "E-TERM": {"O", "B-TERM", "S-TERM"},
    "S-TERM": {"O", "B-TERM", "S-TERM"},
}


@pytest.fixture(scope="module")
def labelled(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return mentions.detect_mentions(docs).cache()


def test_output_is_biose_legal_everywhere(labelled):
    seqs = (
        labelled.groupBy("doc_id")
        .agg(F.expr("transform(array_sort(collect_list(struct(word_index, label))), x -> x.label)").alias("ls"))
        .collect()
    )
    assert seqs
    for r in seqs:
        ls = r.ls
        assert ls[0] in ("O", "B-TERM", "S-TERM")
        assert ls[-1] in ("O", "E-TERM", "S-TERM")
        for a, b in zip(ls, ls[1:]):
            assert b in _LEGAL_NEXT[a], (r.doc_id, a, b)


def test_entity_coverage_exact(labelled, spark):
    """Non-O exactly on gazetteer tokens: the emission walls hold."""
    from hebrew_ner_spark.resources import ENTITY_TERMS

    bad = labelled.where(
        (F.col("token").isin(list(ENTITY_TERMS)) & (F.col("label") == "O"))
        | (~F.col("token").isin(list(ENTITY_TERMS)) & (F.col("label") != "O"))
    ).count()
    assert bad == 0


def test_viterbi_is_load_bearing(labelled, spark):
    """The decode must differ from BOTH degenerate shortcuts: the
    per-position emission argmax (uniform over B/I/E/S -> constant
    B-TERM, illegal) and the neighbourhood gazetteer rule (one maximal
    mention per run) — the seeded transitions re-segment some runs."""
    model = mentions._get_model()
    batch = np.array([["table", "row", "x"]], dtype=object)
    lengths = np.array([3])
    scores = model.scores(batch, lengths)
    argmax_labels = [mentions.LABELS[i] for i in scores[0].argmax(axis=1)[:3]]
    # uniform emissions: argmax lands on the first non-O label for both
    # entity tokens -> B-TERM B-TERM, an illegal bigram
    assert argmax_labels[0] == argmax_labels[1] == "B-TERM"
    decoded = model.decode(scores, lengths)[0]
    assert decoded != argmax_labels
    assert decoded[2] == "O" and decoded[:2] in (["B-TERM", "E-TERM"], ["S-TERM", "S-TERM"])

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    gaz = kg.doc_token_labels(docs)
    n_diff = (
        labelled.alias("m")
        .join(gaz.alias("g"), ["doc_id", "word_index"])
        .where("m.label <> g.label")
        .count()
    )
    assert n_diff > 0  # the seeded weights split at least one run


def test_matches_unbatched_seeded_decode(labelled):
    """The batched/padded/sorted production path must agree with a
    direct per-sentence decode of the same model on a sample."""
    model = mentions._get_model()
    sample = (
        labelled.groupBy("doc_id")
        .agg(
            F.expr("transform(array_sort(collect_list(struct(word_index, token))), x -> x.token)").alias("toks"),
            F.expr("transform(array_sort(collect_list(struct(word_index, label))), x -> x.label)").alias("ls"),
        )
        .limit(25)
        .collect()
    )
    for r in sample:
        toks = np.array([r.toks], dtype=object)
        got = model.decode(model.scores(toks, np.array([len(r.toks)])), np.array([len(r.toks)]))[0]
        assert got == list(r.ls), r.doc_id
