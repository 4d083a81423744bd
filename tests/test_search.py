"""BM25 closed-form scores, ranking properties, plan shape."""

from __future__ import annotations

from hebrew_ner_spark.operators import search


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "customer customer table"),
            (2, "customer slow row"),
            (3, "the a dup"),
        ],
        ["doc_id", "text"],
    )


def test_postings_closed_form(spark):
    got = {r.term: (r.df, r.cf) for r in search.term_postings(_docs(spark)).collect()}
    assert got["customer"] == (2, 3)
    assert got["slow"] == (1, 1)
    assert got["the"] == (1, 1)


def test_bm25_hand_computed(spark):
    # N=3, L=9; idf(customer)=666666, idf(slow)=1500000 (rational idf);
    # d1: tf(customer)=2 -> (666666*396)//288 = 916665
    # d2: tf=1 each -> 666666 + 1500000 = 2166666
    out = search.bm25_topk(_docs(spark), ["customer", "slow"], k=10).collect()
    scores = {r.doc_id: r.score_1e6 for r in out}
    assert scores == {1: 916665, 2: 2166666}


def test_rare_term_outranks_common(spark):
    # ten docs contain 'table'; one doc contains 'vector' -> the vector
    # doc must outrank any single-occurrence table doc
    rows = [(i, "table row data") for i in range(10)] + [(99, "vector row data")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = search.bm25_topk(docs, ["table", "vector"], k=11).collect()
    assert out[0].doc_id == 99


def test_topk_plan_is_take_ordered(spark):
    plan = (
        search.bm25_topk(_docs(spark), ["customer"], k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan  # never a global Sort


def test_bm25_batch_matches_single_query_scores(spark):
    # a batch query's scores must equal the single-query path's scores
    docs = _docs(spark)
    q = spark.createDataFrame(
        [("qa", "customer"), ("qa", "slow")], "qid string, term string"
    )
    batch = {r.doc_id: r.score_1e6 for r in search.bm25_batch(docs, q, k=10).collect()}
    single = {
        r.doc_id: r.score_1e6
        for r in search.bm25_topk(docs, ["customer", "slow"], k=10).collect()
    }
    assert batch == single


def test_bm25_batch_dedups_repeated_terms(spark):
    docs = _docs(spark)
    q_dup = spark.createDataFrame(
        [("qa", "customer"), ("qa", "customer")], "qid string, term string"
    )
    q_one = spark.createDataFrame([("qa", "customer")], "qid string, term string")
    dup = {r.doc_id: r.score_1e6 for r in search.bm25_batch(docs, q_dup, k=10).collect()}
    one = {r.doc_id: r.score_1e6 for r in search.bm25_batch(docs, q_one, k=10).collect()}
    assert dup == one


def test_bm25_batch_plan_group_limits(spark):
    docs = _docs(spark)
    q = spark.createDataFrame([("qa", "customer")], "qid string, term string")
    plan = (
        search.bm25_batch(docs, q, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan


def test_merge_postings_equals_direct(spark):
    from pyspark.sql import functions as F

    docs = _docs(spark)
    direct = {tuple(r) for r in search.term_postings(docs).collect()}
    merged = {
        tuple(r)
        for r in search.merge_postings(
            search.term_postings(docs.where(F.col("doc_id") <= 1)),
            search.term_postings(docs.where(F.col("doc_id") > 1)),
        ).collect()
    }
    assert merged == direct


def test_merge_postings_disjoint_terms_survive(spark):
    base = spark.createDataFrame([("a", 2, 5)], "term string, df long, cf long")
    delta = spark.createDataFrame([("b", 1, 1)], "term string, df long, cf long")
    got = {r.term: (r.df, r.cf) for r in search.merge_postings(base, delta).collect()}
    assert got == {"a": (2, 5), "b": (1, 1)}


def test_phrase_match_closed_form(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c a b a"),      # 'a b' at 0 and 3
            (2, "b a c"),            # no match
            (3, "a b"),              # exactly the phrase
            (4, "a"),                # shorter than the phrase
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: (r.n_matches, r.first_pos)
           for r in search.phrase_match(docs, ["a", "b"]).collect()}
    assert got == {1: (2, 0), 3: (1, 0)}


def test_phrase_match_no_overlap_miscount(spark):
    # overlapping self-similar phrase: 'a a a' contains 'a a' at 0 and 1
    docs = spark.createDataFrame([(1, "a a a")], ["doc_id", "text"])
    [r] = search.phrase_match(docs, ["a", "a"]).collect()
    assert (r.n_matches, r.first_pos) == (2, 0)


def test_phrase_match_zero_shuffle(spark):
    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    plan = (
        search.phrase_match(docs, ["a", "b"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


class TestRrfFuse:
    def _runs(self, spark):
        lex = spark.createDataFrame(
            [("q", 10, 1), ("q", 11, 2), ("q", 12, 3)],
            "qid string, doc_id long, rank long",
        )
        sem = spark.createDataFrame(
            [("q", 11, 1), ("q", 13, 2), ("q", 10, 3)],
            "qid string, doc_id long, rank long",
        )
        return lex, sem

    def test_closed_form_scores(self, spark):
        lex, sem = self._runs(spark)
        got = {r.doc_id: r for r in search.rrf_fuse([lex, sem]).collect()}
        # doc 11: 1e6//62 + 1e6//61 = 16129 + 16393 = 32522 (both runs)
        assert (got[11].rrf_1e6, got[11].n_runs) == (16129 + 16393, 2)
        # doc 10: 1e6//61 + 1e6//63 = 16393 + 15873
        assert (got[10].rrf_1e6, got[10].n_runs) == (16393 + 15873, 2)
        # single-run docs
        assert (got[12].rrf_1e6, got[12].n_runs) == (1_000_000 // 63, 1)
        assert (got[13].rrf_1e6, got[13].n_runs) == (1_000_000 // 62, 1)
        # agreement wins: both two-run docs outrank both one-run docs
        assert got[11].rank == 1 and got[10].rank == 2
        assert {got[12].rank, got[13].rank} == {3, 4}

    def test_topk_cut_and_tie_order(self, spark):
        lex, sem = self._runs(spark)
        out = search.rrf_fuse([lex, sem], k=2).collect()
        assert sorted((r.rank, r.doc_id) for r in out) == [(1, 11), (2, 10)]
        # identical ranks in both runs -> equal scores; tie breaks on doc_id
        a = spark.createDataFrame(
            [("q", 5, 1), ("q", 3, 2)], "qid string, doc_id long, rank long"
        )
        b = spark.createDataFrame(
            [("q", 3, 1), ("q", 5, 2)], "qid string, doc_id long, rank long"
        )
        out = search.rrf_fuse([a, b]).collect()
        assert [(r.rank, r.doc_id) for r in sorted(out, key=lambda r: r.rank)] == [
            (1, 3),
            (2, 5),
        ]

    def test_queries_fuse_independently(self, spark):
        a = spark.createDataFrame(
            [("q1", 1, 1), ("q2", 2, 1)], "qid string, doc_id long, rank long"
        )
        b = spark.createDataFrame(
            [("q1", 1, 1), ("q2", 3, 1)], "qid string, doc_id long, rank long"
        )
        got = {(r.qid, r.doc_id): r.rank for r in search.rrf_fuse([a, b]).collect()}
        assert got == {("q1", 1): 1, ("q2", 2): 1, ("q2", 3): 2}
