"""Gates: inverted-index postings stats + exact-integer BM25 top-k.

The oracle replays the identical integer BM25 (operators/search.py) in
DuckDB — same cleared-denominator contrib formula, same rational idf,
same (score DESC, doc_id) deterministic cut — so the two engines agree
on every scored row, not just on ranking."""

from __future__ import annotations

from hebrew_ner_spark.operators import search
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table

# Fixed gate query: one frequent term, one mid, one adjective.
BM25_TERMS = ["customer", "vector", "slow"]
_TERMS_SQL = "[" + ", ".join(f"'{t}'" for t in BM25_TERMS) + "]"


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@query(
    "srch_postings",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    per AS (
      SELECT doc_id, term, len(list_filter(toks, x -> x = term)) AS tf
      FROM (SELECT doc_id, toks, unnest(list_distinct(toks)) AS term FROM t)
    )
    SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf
    FROM per GROUP BY term
    """,
)
def srch_postings(spark, sf_dir):
    """Inverted-index statistics (term, df, cf) over the corpus
    (operators/search.py term_postings — array-side tf, one agg)."""
    return search.term_postings(_docs(spark, sf_dir))


@query(
    "srch_bm25_topk",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    d AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS len_d FROM t),
    tfs AS (
      SELECT doc_id, len_d, term,
             CAST(len(list_filter(toks, x -> x = term)) AS BIGINT) AS tf
      FROM d CROSS JOIN (SELECT unnest({_TERMS_SQL}) AS term)
    ),
    m AS (SELECT * FROM tfs WHERE tf > 0),
    dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM m GROUP BY term),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(len_d) AS BIGINT) AS n_toks FROM d),
    scored AS (
      SELECT doc_id,
             ((1000000 * (n_docs - df + 1)) // (df + 1)) * 22 * tf * n_toks
               // (10 * tf * n_toks + 3 * n_toks + 9 * len_d * n_docs) AS contrib
      FROM m JOIN dfreq USING (term) CROSS JOIN tot
    )
    SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS score_1e6
    FROM scored GROUP BY doc_id
    ORDER BY score_1e6 DESC, doc_id LIMIT {search.BM25_TOPK}
    """,
)
def srch_bm25_topk(spark, sf_dir):
    """Exact-integer Okapi BM25 top-k for a fixed bag-of-terms query
    (operators/search.py bm25_topk — array-side tf, broadcast df/totals,
    TakeOrderedAndProject cut)."""
    return search.bm25_topk(_docs(spark, sf_dir), BM25_TERMS)


# Fixed batch: three queries sharing terms (shared-term df must be
# computed once and agree across queries).
BM25_BATCH = [
    ("q_cust", "customer"),
    ("q_cust", "table"),
    ("q_fast", "fast"),
    ("q_fast", "vector"),
    ("q_mix", "customer"),
    ("q_mix", "fast"),
    ("q_mix", "slow"),
]
_BATCH_VALUES = ", ".join(f"('{q}', '{t}')" for q, t in BM25_BATCH)


@query(
    "srch_bm25_batch",
    oracle=f"""
    WITH qr(qid, term) AS (VALUES {_BATCH_VALUES}),
    q AS (SELECT DISTINCT qid, term FROM qr),
    qt AS (SELECT DISTINCT term FROM q),
    t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    d AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS len_d FROM t),
    occ AS (SELECT doc_id, len_d, unnest(toks) AS term FROM d),
    m AS (SELECT doc_id, len_d, term, CAST(count(*) AS BIGINT) AS tf
          FROM occ JOIN qt USING (term) GROUP BY 1, 2, 3),
    dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM m GROUP BY term),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(len_d) AS BIGINT) AS n_toks FROM d),
    scored AS (
      SELECT doc_id, term,
             ((1000000 * (n_docs - df + 1)) // (df + 1)) * 22 * tf * n_toks
               // (10 * tf * n_toks + 3 * n_toks + 9 * len_d * n_docs) AS c
      FROM m JOIN dfreq USING (term) CROSS JOIN tot
    ),
    per_q AS (
      SELECT qid, doc_id, CAST(sum(c) AS BIGINT) AS score_1e6
      FROM scored JOIN q USING (term) GROUP BY 1, 2
    ),
    ranked AS (
      SELECT qid, doc_id, score_1e6,
             CAST(row_number() OVER (PARTITION BY qid
                                     ORDER BY score_1e6 DESC, doc_id) AS BIGINT) AS rank
      FROM per_q
    )
    SELECT qid, doc_id, score_1e6, rank FROM ranked
    WHERE rank <= {search.BM25_BATCH_K}
    """,
)
def srch_bm25_batch(spark, sf_dir):
    """Batch BM25: per-query top-k for a query TABLE in one corpus pass
    (operators/search.py bm25_batch — broadcast term-set pruning before
    the tf aggregate, WindowGroupLimit per-query cut)."""
    q = spark.createDataFrame(BM25_BATCH, "qid string, term string")
    return search.bm25_batch(_docs(spark, sf_dir), q)


@query(
    "srch_postings_delta",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    per AS (
      SELECT doc_id, term, len(list_filter(toks, x -> x = term)) AS tf
      FROM (SELECT doc_id, toks, unnest(list_distinct(toks)) AS term FROM t)
    )
    SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf
    FROM per GROUP BY term
    """,
)
def srch_postings_delta(spark, sf_dir):
    """Incremental index maintenance contract: postings(base) folded
    with postings(delta) must equal postings built over the whole corpus
    (operators/search.py merge_postings — one term-keyed full-outer
    join, base corpus never re-tokenized)."""
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    base = search.term_postings(docs.where(F.col("doc_id") % 2 == 0))
    delta = search.term_postings(docs.where(F.col("doc_id") % 2 != 0))
    return search.merge_postings(base, delta)


PHRASE = ["the", "customer"]  # frequent-enough bigram for a non-vacuous gate
_PHRASE_SQL = "[" + ", ".join(f"'{t}'" for t in PHRASE) + "]"


@query(
    "srch_phrase_match",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    m AS (
      SELECT doc_id,
             list_filter(range(0, greatest(len(toks) - {len(PHRASE)} + 1, 0)),
               i -> toks[CAST(i + 1 AS INT):CAST(i + {len(PHRASE)} AS INT)]
                      = {_PHRASE_SQL}) AS hits
      FROM t)
    SELECT doc_id,
           CAST(len(hits) AS BIGINT) AS n_matches,
           CAST(hits[1] AS BIGINT) AS first_pos
    FROM m WHERE len(hits) > 0
    """,
)
def srch_phrase_match(spark, sf_dir):
    """Exact phrase search: verbatim token-sequence occurrences with
    count and first position (operators/search.py phrase_match —
    one array-side codegen stage, zero shuffles)."""
    return search.phrase_match(_docs(spark, sf_dir), PHRASE)


# Hybrid retrieval: the three BM25 batch queries paired with query
# vectors 0/1/2 (embeddings row i is document i's vector, so this is the
# same id space on both runs). Frozen — the oracle embeds the same map.
RRF_QID_MAP = [("q_cust", 0), ("q_fast", 1), ("q_mix", 2)]
_RRF_MAP_VALUES = ", ".join(f"('{q}', {v})" for q, v in RRF_QID_MAP)
_RRF_NQ = len(RRF_QID_MAP)

from hebrew_ner_spark.querydefs.simsearch_q import _DOT_QE, _E_CTE


@query(
    "srch_rrf_hybrid",
    oracle=f"""
    WITH qr(qid, term) AS (VALUES {_BATCH_VALUES}),
    q AS (SELECT DISTINCT qid, term FROM qr),
    qt AS (SELECT DISTINCT term FROM q),
    t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    d AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS len_d FROM t),
    occ AS (SELECT doc_id, len_d, unnest(toks) AS term FROM d),
    m AS (SELECT doc_id, len_d, term, CAST(count(*) AS BIGINT) AS tf
          FROM occ JOIN qt USING (term) GROUP BY 1, 2, 3),
    dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM m GROUP BY term),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(len_d) AS BIGINT) AS n_toks FROM d),
    scored AS (
      SELECT doc_id, term,
             ((1000000 * (n_docs - df + 1)) // (df + 1)) * 22 * tf * n_toks
               // (10 * tf * n_toks + 3 * n_toks + 9 * len_d * n_docs) AS c
      FROM m JOIN dfreq USING (term) CROSS JOIN tot
    ),
    per_q AS (
      SELECT qid, doc_id, CAST(sum(c) AS BIGINT) AS score_1e6
      FROM scored JOIN q USING (term) GROUP BY 1, 2
    ),
    ranked AS (
      SELECT qid, doc_id, score_1e6,
             CAST(row_number() OVER (PARTITION BY qid
                                     ORDER BY score_1e6 DESC, doc_id) AS BIGINT) AS rank
      FROM per_q
    ),
    {_E_CTE.strip()},
    qset AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn
             FROM e WHERE vec_id < {_RRF_NQ}),
    s AS (
      SELECT qset.qid, e.vec_id AS nid,
             CAST(round({_DOT_QE} / (e.nrm * qset.qn) * 1000000.0) AS BIGINT) AS cos_1e6
      FROM e CROSS JOIN qset WHERE e.vec_id <> qset.qid
    ),
    sr AS (
      SELECT qid, nid,
             CAST(row_number() OVER (PARTITION BY qid
                                     ORDER BY cos_1e6 DESC, nid) AS BIGINT) AS rank
      FROM s QUALIFY rank <= {search.BM25_BATCH_K}
    ),
    rrf_map(qid, qid_s) AS (VALUES {_RRF_MAP_VALUES}),
    rrf_lex AS (
      SELECT qid, doc_id, CAST(1000000 // (60 + rank) AS BIGINT) AS c
      FROM ranked WHERE rank <= {search.BM25_BATCH_K}),
    rrf_sem AS (
      SELECT mp.qid, sr.nid AS doc_id, CAST(1000000 // (60 + sr.rank) AS BIGINT) AS c
      FROM sr JOIN rrf_map mp ON mp.qid_s = sr.qid),
    rrf_all AS (SELECT * FROM rrf_lex UNION ALL SELECT * FROM rrf_sem),
    rrf_f AS (
      SELECT qid, doc_id,
             CAST(count(*) AS BIGINT) AS n_runs,
             CAST(sum(c) AS BIGINT) AS rrf_1e6
      FROM rrf_all GROUP BY 1, 2)
    SELECT qid, doc_id, n_runs, rrf_1e6,
           CAST(row_number() OVER (PARTITION BY qid
                                   ORDER BY rrf_1e6 DESC, doc_id) AS BIGINT) AS rank
    FROM rrf_f QUALIFY rank <= {search.RRF_TOPK}
    """,
)
def srch_rrf_hybrid(spark, sf_dir):
    """Hybrid retrieval: Reciprocal Rank Fusion of the batch-BM25
    lexical run and the brute-force cosine semantic run over the SAME
    three queries (operators/search.py rrf_fuse) — rank-only integer
    fusion, so lexical and semantic score scales never need calibration."""
    from pyspark.sql import functions as F

    from hebrew_ner_spark.operators import simsearch

    docs = _docs(spark, sf_dir)
    q = spark.createDataFrame(BM25_BATCH, "qid string, term string")
    lex = search.bm25_batch(docs, q).select("qid", "doc_id", "rank")

    emb = load_table(spark, sf_dir, "embeddings")
    qid_map = spark.createDataFrame(RRF_QID_MAP, "qid string, qid_s long")
    sem = (
        simsearch.brute_topk(emb, n_queries=_RRF_NQ, k=search.BM25_BATCH_K)
        .withColumnRenamed("qid", "qid_s")
        .join(F.broadcast(qid_map), "qid_s")
        .select("qid", F.col("nid").alias("doc_id"), "rank")
    )
    return search.rrf_fuse([lex, sem])
