"""Gates for int8 scalar quantization (operators/sq.py).

The oracle replays the whole chain long-form (unnest -> min/max ->
round-half-up quantize -> code-space distance): integer-only, with the
same ``(2*num + den) // (2*den)`` half-up identity and trunc-toward-zero
division the Spark plan uses. CTE names are sq-prefixed."""

from __future__ import annotations

from hebrew_ner_spark.operators import sq
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table

L = sq.SQ_LEVELS
Q = sq.SQ_QUERIES
TOPK = sq.SQ_TOPK
D = sq.DIM

# long-form micro components with 0-based dim
_SQVALS = """
sqvals AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS val
  FROM embeddings
)
"""

_SQMM = """
sqmm AS (
  SELECT dim, min(val) AS mn, max(val) AS mx FROM sqvals GROUP BY dim
)
"""

_SQC = f"""
sqc AS (
  SELECT v.vec_id, v.dim,
         CASE WHEN m.mx = m.mn THEN 0
              ELSE CAST((2 * (v.val - m.mn) * {L} + (m.mx - m.mn))
                        // (2 * (m.mx - m.mn)) AS BIGINT) END AS q
  FROM sqvals v JOIN sqmm m ON v.dim = m.dim
)
"""

_SQ_BASE = f"WITH {_SQVALS},\n{_SQMM},\n{_SQC}"


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@query(
    "ann_sq_codes",
    oracle=f"""
    {_SQ_BASE}
    SELECT vec_id, CAST(dim AS BIGINT) AS dim, q FROM sqc
    """,
)
def ann_sq_codes(spark, sf_dir):
    """The quantized corpus itself (long form): any drift in the min/max
    pass or the half-up quantizer shows here first."""
    return sq.sq_codes_long(_emb(spark, sf_dir))


_SQ_TOPK = f"""
sqd AS (
  SELECT qc.vec_id AS qid, vc.vec_id AS nid,
         CAST(sum(((abs(qc.q - vc.q) * (m.mx - m.mn)) // {L})
                  * ((abs(qc.q - vc.q) * (m.mx - m.mn)) // {L})) AS BIGINT) AS d
  FROM sqc qc
  JOIN sqc vc ON qc.dim = vc.dim
  JOIN sqmm m ON qc.dim = m.dim
  WHERE qc.vec_id < {Q}
  GROUP BY qc.vec_id, vc.vec_id
),
sqtopk AS (
  SELECT qid, nid, rank, d FROM (
    SELECT qid, nid, d,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY d, nid) AS BIGINT) AS rank
    FROM sqd) WHERE rank <= {TOPK}
)
"""


@query(
    "ann_sq_topk",
    oracle=f"""
    {_SQ_BASE},
    {_SQ_TOPK}
    SELECT qid, nid, rank, d FROM sqtopk
    """,
)
def ann_sq_topk(spark, sf_dir):
    """Code-space top-k: distances in micro units via the telescoped
    dequantized diff (offsets cancel; spans broadcast)."""
    return sq.sq_topk(_emb(spark, sf_dir))


@query(
    "ann_sq_recall",
    oracle=f"""
    {_SQ_BASE},
    {_SQ_TOPK},
    sqmv AS (
      SELECT vec_id, list(val ORDER BY dim) AS mv FROM sqvals GROUP BY vec_id
    ),
    sqexact AS (
      SELECT qid, nid FROM (
        SELECT q.vec_id AS qid, v.vec_id AS nid,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY
                 CAST(list_sum(list_transform(range(1, {D + 1}),
                   i -> (q.mv[i] - v.mv[i]) * (q.mv[i] - v.mv[i]))) AS BIGINT),
                 v.vec_id) AS r
        FROM sqmv q CROSS JOIN sqmv v
        WHERE q.vec_id < {Q}) WHERE r <= {TOPK}
    ),
    sqhits AS (
      SELECT t.qid, count(*) AS h
      FROM sqtopk t JOIN sqexact e ON t.qid = e.qid AND t.nid = e.nid
      GROUP BY t.qid
    )
    SELECT e.qid, CAST(coalesce(h.h, 0) AS BIGINT) AS hits,
           CAST({TOPK} AS BIGINT) AS k
    FROM (SELECT DISTINCT qid FROM sqexact) e
    LEFT JOIN sqhits h ON e.qid = h.qid
    """,
)
def ann_sq_recall(spark, sf_dir):
    """Near-losslessness, measured: |SQ8 top-k ∩ exact top-k| per query.
    The pytest pins the floor well above the PQ tier's recall."""
    return sq.sq_recall(_emb(spark, sf_dir))
