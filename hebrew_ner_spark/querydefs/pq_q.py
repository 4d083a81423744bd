"""Correctness gates for product quantization (operators/pq.py).

The oracle unrolls the per-subspace Lloyd training exactly like the IVF
oracle in simsearch_q.py: micro-unit integers, integer squared L2,
truncating integer mean, row_number argmin with (distance, code) tie
order — every iteration a CTE, every value bit-for-bit.

CTE names are pq-prefixed (house rule: fragments share a namespace)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hebrew_ner_spark.operators import pq
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table

M = pq.PQ_M
SD = pq.PQ_SUBDIM
K = pq.PQ_K
ITERS = pq.PQ_ITERS
Q = pq.PQ_QUERIES
TOPK = pq.PQ_TOPK

_PQMV = """
pqmv AS (
  SELECT vec_id, list_transform(embedding, x ->
           CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS mv
  FROM embeddings
)
"""

_PQSV = f"""
pqsv AS (
  SELECT vec_id, m,
         list_transform(range(1, {SD + 1}), i -> mv[m * {SD} + i]) AS sub
  FROM pqmv CROSS JOIN (SELECT unnest(range({M})) AS m)
)
"""

_SQD = (
    f"CAST(list_sum(list_transform(range(1, {SD + 1}),"
    " i -> (sv.sub[i] - b.cent[i]) * (sv.sub[i] - b.cent[i]))) AS BIGINT)"
)


def _lloyd(iters: int = ITERS) -> tuple[str, str]:
    """(ctes, final_book_cte): pqb0 = seed slices of the first K vectors,
    then per iteration pqs (distance) -> pqa (argmin) -> pqb (int mean)."""
    parts = [
        f"pqb0 AS (SELECT m, vec_id AS code, sub AS cent FROM pqsv WHERE vec_id < {K})"
    ]
    prev = "pqb0"
    for it in range(1, iters + 1):
        parts.append(f"""
pqs{it} AS (
  SELECT sv.vec_id, sv.m, b.code, {_SQD} AS d
  FROM pqsv sv JOIN {prev} b ON sv.m = b.m
)""")
        parts.append(f"""
pqa{it} AS (
  SELECT vec_id, m, code FROM (
    SELECT vec_id, m, code,
           row_number() OVER (PARTITION BY vec_id, m ORDER BY d, code) AS r
    FROM pqs{it}) WHERE r = 1
)""")
        parts.append(f"""
pqb{it} AS (
  SELECT m, code, list(cv ORDER BY dim) AS cent FROM (
    SELECT a.m, a.code, x.dim, CAST(sum(x.val) // count(*) AS BIGINT) AS cv
    FROM (SELECT vec_id, m, generate_subscripts(sub, 1) AS dim, unnest(sub) AS val
          FROM pqsv) x
    JOIN pqa{it} a ON x.vec_id = a.vec_id AND x.m = a.m
    GROUP BY a.m, a.code, x.dim) GROUP BY m, code
)""")
        prev = f"pqb{it}"
    return ",\n".join(parts), prev


_LLOYD_SQL, _BFINAL = _lloyd()

# final assignment of every (vector, subspace) against the trained book
_PQCODES = f"""
pqcodes AS (
  SELECT vec_id, m, code FROM (
    SELECT sv.vec_id, sv.m, b.code,
           row_number() OVER (PARTITION BY sv.vec_id, sv.m ORDER BY {_SQD}, b.code) AS r
    FROM pqsv sv JOIN {_BFINAL} b ON sv.m = b.m) WHERE r = 1
)
"""

_PQ_BASE = f"WITH {_PQMV},\n{_PQSV},\n{_LLOYD_SQL},\n{_PQCODES}"


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


# Trained-codebook memo per corpus dir (the _trained_cents pattern):
# pq_codebooks returns a driver-local PQ_M x PQ_K relation, so the memo
# stores rows + schema and rebuilds a local table per call.
_BOOKS_MEMO: dict = {}


def _trained_books(spark, sf_dir):
    if sf_dir not in _BOOKS_MEMO:
        books = pq.pq_codebooks(_emb(spark, sf_dir))
        _BOOKS_MEMO[sf_dir] = (books.collect(), books.schema)
    rows, schema = _BOOKS_MEMO[sf_dir]
    return spark.createDataFrame(rows, schema)


@query(
    "ann_pq_codes",
    oracle=f"""
    {_PQ_BASE}
    SELECT vec_id, CAST(m AS BIGINT) AS m, CAST(code AS BIGINT) AS code
    FROM pqcodes
    """,
)
def ann_pq_codes(spark, sf_dir):
    """The compressed index itself: every (vector, subspace) code after
    seeded Lloyd — any drift in a sum, mean, or tie order shows here
    first. Spark side is the zero-shuffle in-row argmin."""
    emb = _emb(spark, sf_dir)
    return pq.pq_encode(emb, _trained_books(spark, sf_dir)).select(
        "vec_id",
        F.col("m").cast("long").alias("m"),
        F.col("code").cast("long").alias("code"),
    )


# ADC: lookup table = query sub-vectors x trained book; corpus rows score
# by summing their codes' table entries.
_PQLUT = f"""
pqlut AS (
  SELECT sv.vec_id AS qid, sv.m, b.code, {_SQD} AS d
  FROM pqsv sv JOIN {_BFINAL} b ON sv.m = b.m
  WHERE sv.vec_id < {Q}
)
"""

_PQ_ADC = f"""
{_PQLUT},
pqscored AS (
  SELECT l.qid, c.vec_id AS nid, CAST(sum(l.d) AS BIGINT) AS adc_d
  FROM pqcodes c JOIN pqlut l ON c.m = l.m AND c.code = l.code
  GROUP BY l.qid, c.vec_id
),
pqtopk AS (
  SELECT qid, nid, rank, adc_d FROM (
    SELECT qid, nid, adc_d,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY adc_d, nid) AS BIGINT) AS rank
    FROM pqscored) WHERE rank <= {TOPK}
)
"""


@query(
    "ann_pq_topk",
    oracle=f"""
    {_PQ_BASE},
    {_PQ_ADC}
    SELECT qid, nid, rank, adc_d FROM pqtopk
    """,
)
def ann_pq_topk(spark, sf_dir):
    """Asymmetric-distance top-k over the compressed index — the search
    path a 10^12-row corpus actually runs (codes scan + broadcast lookup
    tables; full-precision vectors only touched for the Q queries)."""
    emb = _emb(spark, sf_dir)
    return pq.pq_adc_topk(emb, books=_trained_books(spark, sf_dir))


@query(
    "ann_pq_recall",
    oracle=f"""
    {_PQ_BASE},
    {_PQ_ADC},
    pqexact AS (
      SELECT qid, nid FROM (
        SELECT q.vec_id AS qid, v.vec_id AS nid,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY
                 CAST(list_sum(list_transform(range(1, {M * SD + 1}),
                   i -> (q.mv[i] - v.mv[i]) * (q.mv[i] - v.mv[i]))) AS BIGINT),
                 v.vec_id) AS r
        FROM pqmv q CROSS JOIN pqmv v
        WHERE q.vec_id < {Q}) WHERE r <= {TOPK}
    ),
    pqhits AS (
      SELECT t.qid, count(*) AS h
      FROM pqtopk t JOIN pqexact e ON t.qid = e.qid AND t.nid = e.nid
      GROUP BY t.qid
    )
    SELECT e.qid, CAST(coalesce(h.h, 0) AS BIGINT) AS hits,
           CAST({TOPK} AS BIGINT) AS k
    FROM (SELECT DISTINCT qid FROM pqexact) e
    LEFT JOIN pqhits h ON e.qid = h.qid
    """,
)
def ann_pq_recall(spark, sf_dir):
    """Compression quality: |ADC top-k ∩ exact-L2 top-k| per query.
    Exact integers on both sides; zero-hit queries report 0 (left join
    from the query universe on both engines)."""
    return pq.pq_recall(_emb(spark, sf_dir), books=_trained_books(spark, sf_dir))


def _ivfpq_oracle() -> str:
    """IVF-PQ composition: the simsearch Lloyd/probe chain (mv, cells,
    probes — imported CTE text, cosine probe over trained centroids)
    plus the PQ chain (codebooks, codes, lut), joined so ADC scores only
    candidates in probed cells. CTE namespaces are disjoint by
    construction (mv/c*/fin/cells/probes vs pq*)."""
    from hebrew_ner_spark.querydefs.simsearch_q import _IVF_CTE, _MV_CTE

    return f"""
    WITH {_MV_CTE},
    {_IVF_CTE},
    {_PQMV},
    {_PQSV},
    {_LLOYD_SQL},
    {_PQCODES},
    {_PQLUT},
    ivfpqscored AS (
      SELECT l.qid, c.vec_id AS nid, CAST(sum(l.d) AS BIGINT) AS adc_d
      FROM pqcodes c
      JOIN cells ce ON ce.vec_id = c.vec_id
      JOIN probes p ON p.cell = ce.cell
      JOIN pqlut l ON l.qid = p.qid AND l.m = c.m AND l.code = c.code
      GROUP BY l.qid, c.vec_id
    )
    SELECT qid, nid, rank, adc_d FROM (
      SELECT qid, nid, adc_d,
             CAST(row_number() OVER (PARTITION BY qid ORDER BY adc_d, nid) AS BIGINT) AS rank
      FROM ivfpqscored) WHERE rank <= {TOPK}
    """


@query("ann_ivfpq_topk", oracle=_ivfpq_oracle())
def ann_ivfpq_topk(spark, sf_dir):
    """The production ANN layout (FAISS IndexIVFPQ): probe trained IVF
    cells, ADC-score only the PQ codes living there. Composes the two
    trained-index memos, so any drift in EITHER index surfaces here."""
    from hebrew_ner_spark.querydefs.simsearch_q import _trained_cents

    emb = _emb(spark, sf_dir)
    return pq.ivfpq_topk(
        emb,
        cents=_trained_cents(spark, sf_dir),
        books=_trained_books(spark, sf_dir),
    )
