"""Coreference sieve tests: closed-form fixtures + plan shape."""

import pytest
from pyspark.sql import functions as F

from hebrew_ner_spark.operators import coref, kg

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def _mini(spark, text):
    return spark.createDataFrame([(0, text)], "doc_id long, text string")


def test_mentions_nearest_preceding_entity(spark):
    # a(1) -> table(0); a(4) -> row(3); 'the' is untouched filler
    d = _mini(spark, "table a scan row a the a")
    out = coref.coref_mentions(d).orderBy("word_index").collect()
    assert [(r.word_index, r.ante_index, r.antecedent) for r in out] == [
        (1, 0, "table"),
        (4, 3, "row"),
        (6, 3, "row"),
    ]


def test_unresolved_pronoun_sentinel(spark):
    d = _mini(spark, "a scan table a")
    out = coref.coref_mentions(d).orderBy("word_index").collect()
    assert (out[0].word_index, out[0].ante_index, out[0].antecedent) == (0, -1, "")
    assert (out[1].ante_index, out[1].antecedent) == (2, "table")


def test_resolution_creates_svo_triple(spark):
    # baseline: no svo ('a' is not an entity); resolved: row scan row
    d = _mini(spark, "row scan a")
    base = kg.doc_triples_patterns(d).where(F.col("pattern") == "svo").count()
    boosted = coref.coref_triples(d).where(F.col("pattern") == "svo").collect()
    assert base == 0
    assert [(t.subj, t.pred, t.obj) for t in boosted] == [("row", "scan", "row")]


def test_substitution_dissolves_gap_pattern(spark):
    # baseline: table scan a table = svo_gap_obj; resolved 'a'->table
    # turns it into plain svo at the same anchor
    d = _mini(spark, "table scan a table")
    base = kg.doc_triples_patterns(d).collect()
    boosted = coref.coref_triples(d).collect()
    assert any(t.pattern == "svo_gap_obj" for t in base)
    svo = [t for t in boosted if t.word_index == 1]
    assert [(t.pattern, t.subj, t.obj) for t in svo] == [("svo", "table", "table")]


def test_gain_positive_on_corpus(docs):
    out = coref.coref_gain(docs).toPandas()
    assert set(out.pattern) == {"svo", "svo_gap_subj", "svo_gap_obj", "appos", "has_attr"}
    # net recall boost: resolved text yields strictly more triples overall
    assert out.n_coref.sum() > out.n_base.sum()
    # and the direct svo pattern specifically gains
    svo = out[out.pattern == "svo"].iloc[0]
    assert svo.n_coref > svo.n_base


def test_extraction_is_zero_shuffle(docs):
    plan = (
        coref.coref_triples(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "FileScan" in plan or "Scan parquet" in plan
