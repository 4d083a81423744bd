"""Skew handling tests (SURVEY.md §5 item 5): a synthetic corpus where
one mega-entity owns ~25% of all mentions; the salted two-phase plans
must produce results identical to the plain plans."""

import pytest
from pyspark.sql import Row, functions as F

from hebrew_ner_spark.operators import kg
from hebrew_ner_spark.plans.skew import salted_agg, salted_count


@pytest.fixture(scope="module")
def skewed_docs(spark):
    # 'spark' appears in ~25% of all triples: the mega-entity
    rows = []
    for i in range(400):
        if i % 4 == 0:
            rows.append(Row(doc_id=i, text="spark join table the spark merge spark",
                            lang="en", source="s", n_chars=40))
        else:
            rows.append(Row(doc_id=i, text=f"key agg row part{i % 7} scan value",
                            lang="en", source="s", n_chars=30))
    return spark.createDataFrame(rows).cache()


def test_salted_triple_counts_equal_plain_under_skew(skewed_docs):
    plain = {
        (r.subj, r.pred, r.obj): r.n_evidence
        for r in kg.triple_counts(skewed_docs).collect()
    }
    salted = {
        (r.subj, r.pred, r.obj): r.n_evidence
        for r in kg.triple_counts(skewed_docs, salt_buckets=16).collect()
    }
    assert plain == salted
    # the hot key really is hot
    hot = sum(v for k, v in plain.items() if "spark" in k)
    assert hot >= 0.2 * sum(plain.values())


def test_salted_count_general(spark):
    df = spark.createDataFrame(
        [Row(k="hot", v=i) for i in range(900)] + [Row(k=f"k{i}", v=i) for i in range(100)]
    )
    plain = {r.k: r["count"] for r in df.groupBy("k").count().collect()}
    salted = {r.k: r.n for r in salted_count(df, ["k"], buckets=8, out_col="n").collect()}
    assert plain == salted


def test_salted_agg_algebraic_measures(spark):
    df = spark.createDataFrame(
        [Row(k="hot", v=float(i)) for i in range(1000)]
        + [Row(k="cold", v=float(i)) for i in range(10)]
    )
    plain = {
        r.k: (r.s, r.mn, r.mx, r.c)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.min("v").alias("mn"),
             F.max("v").alias("mx"), F.count("*").alias("c"))
        .collect()
    }
    two_phase = salted_agg(
        df, ["k"], buckets=8,
        partial_aggs=[F.sum("v").alias("ps"), F.min("v").alias("pmn"),
                      F.max("v").alias("pmx"), F.count("*").alias("pc")],
        final_aggs=[F.sum("ps").alias("s"), F.min("pmn").alias("mn"),
                    F.max("pmx").alias("mx"), F.sum("pc").alias("c")],
    )
    salted = {r.k: (r.s, r.mn, r.mx, r.c) for r in two_phase.collect()}
    assert plain == salted
