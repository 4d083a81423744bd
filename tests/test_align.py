"""Entity-alignment invariants (operators/align.py): closed-form weighted
scores, identity recovery on a renamed-subject split, deterministic tie
rule, and the stop-feature cap semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from hebrew_ner_spark.operators import align, kg


def _t(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


A = [
    ("e1", "p", "o1"),  # rare feature shared with e1_b only
    ("e1", "p", "o2"),  # ubiquitous feature (all four subjects)
    ("e2", "p", "o2"),
]
B = [
    ("e1_b", "p", "o1"),
    ("e1_b", "p", "o2"),
    ("e9_b", "p", "o2"),
]


def test_scores_closed_form(spark):
    got = {
        (r.ea, r.eb): (r.n_shared, r.score_1e6)
        for r in align.align_scores(_t(spark, A), _t(spark, B)).collect()
    }
    # df(p,o1)=2 -> 500000; df(p,o2)=4 -> 250000
    assert got == {
        ("e1", "e1_b"): (2, 750000),
        ("e2", "e1_b"): (1, 250000),
        ("e1", "e9_b"): (1, 250000),
        ("e2", "e9_b"): (1, 250000),
    }


def test_best_assignment_and_tie_rule(spark):
    got = {
        r.eb: (r.ea, r.score_1e6)
        for r in align.align_best(_t(spark, A), _t(spark, B)).collect()
    }
    # e9_b ties e1/e2 at 250000 -> lexicographically smallest ea wins
    assert got == {"e1_b": ("e1", 750000), "e9_b": ("e1", 250000)}


def test_stop_feature_cap(spark):
    got = [
        tuple(r)
        for r in align.align_scores(
            _t(spark, A), _t(spark, B), max_feature_df=2
        ).collect()
    ]
    # the df=4 feature is dropped; only the rare shared feature scores
    assert got == [("e1", "e1_b", 1, 500000)]


def test_recovers_identity_on_renamed_split(spark):
    # build A/B from disjoint doc halves, B subjects renamed *_b: every
    # best match whose evidence is unambiguous should map x_b -> x.
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["key join table", "key scan row", "row merge table"] * 4
        )],
        "doc_id long, text string",
    )
    a = kg.doc_triples(docs.where("doc_id % 2 = 0")).select("subj", "pred", "obj")
    b = kg.doc_triples(docs.where("doc_id % 2 = 1")).select(
        F.concat(F.col("subj"), F.lit("_b")).alias("subj"), "pred", "obj"
    )
    got = {r.eb: r.ea for r in align.align_best(a, b).collect()}
    assert got == {"key_b": "key", "row_b": "row"}


class TestSameasComponents:
    def test_star_merge_and_namespacing(self, spark):
        # A-graph: 'customer' and 'query' both carry (scan, table);
        # B-graph: 'customer_b' shares it. align_best maps customer_b ->
        # the lexicographically smaller tied A entity; closure yields one
        # component containing A and B vertices with namespaced names.
        from hebrew_ner_spark.operators.align import sameas_components

        a = spark.createDataFrame(
            [("customer", "scan", "table")], ["subj", "pred", "obj"]
        )
        b = spark.createDataFrame(
            [("customer_b", "scan", "table")], ["subj", "pred", "obj"]
        )
        rows = {r.vertex: r.component for r in sameas_components(a, b).collect()}
        assert rows == {
            "A:customer": "A:customer",
            "B:customer_b": "A:customer",
        }

    def test_unaligned_entities_absent(self, spark):
        from hebrew_ner_spark.operators.align import sameas_components

        a = spark.createDataFrame([("x", "scan", "table")], ["subj", "pred", "obj"])
        b = spark.createDataFrame([("y", "sort", "row")], ["subj", "pred", "obj"])
        assert sameas_components(a, b).count() == 0  # no shared features
