"""Scalar (int8) quantization for the embedding column.

The OTHER standard production vector-compression path (FAISS SQ8,
Milvus/pgvector int8): per-dimension affine quantization to 0..255.
Where PQ (operators/pq.py) trades recall for 16x compression via
codebooks, SQ8 is the 4x-compression near-lossless tier — the usual
first step before IVF/PQ at 10^12 rows, because it quarters scan memory
traffic with no training beyond a min/max pass.

Exact-integer throughout:

* components are micro-unit bigints (the shared ``_micro_vecs``);
* the quantizer is the repo's round-half-up identity
  ``q = (2*(x-mn)*255 + (mx-mn)) DIV (2*(mx-mn))`` (0 when the
  dimension is constant);
* distances never reconstruct: with per-dim span ``s = mx-mn``, the
  dequantized difference telescopes to ``(q_a - q_b) * s_d / 255``
  (the additive ``mn`` offsets cancel). Each per-dim diff is brought
  back to micro units BEFORE squaring — ``(abs(dq)*s) DIV 255`` —
  so the squared sum has the same magnitude as the exact integer L2
  (<= 64 * (4e6)^2 ~ 1e15 for |component| <= 2), far inside int64;
  truncation toward zero is engine-identical on the non-negative args.

Scale shape: training is ONE map-side-combined aggregate over
(dim, min, max) — 64 result rows, driver-sized; quantization and search
are broadcast + map (no corpus shuffle); ranking is the same per-query
window as every other top-k in the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hebrew_ner_spark.operators.simsearch import _micro_vecs

DIM = 64
SQ_LEVELS = 255  # codes 0..255
SQ_QUERIES = 8
SQ_TOPK = 10


def sq_train(emb: DataFrame) -> DataFrame:
    """(dim, mn, mx): per-dimension micro-unit min/max — the whole
    'model'. One posexplode + one aggregate (64 keys; partial agg
    combines map-side, so the exchange carries 64 rows per task)."""
    return (
        _micro_vecs(emb)
        .select(F.posexplode("mv").alias("dim", "val"))
        .groupBy("dim")
        .agg(F.min("val").alias("mn"), F.max("val").alias("mx"))
    )


def _as_arrays(params: DataFrame) -> DataFrame:
    """One row (mns array, mxs array) ordered by dim — the broadcast form."""
    return params.agg(
        F.expr("transform(array_sort(collect_list(struct(dim, mn))), p -> p.mn)").alias(
            "mns"
        ),
        F.expr("transform(array_sort(collect_list(struct(dim, mx))), p -> p.mx)").alias(
            "mxs"
        ),
    )


_QUANT = f"""
transform(mv, (x, i) -> CASE
  WHEN element_at(mxs, i + 1) = element_at(mns, i + 1) THEN 0L
  ELSE (2 * (x - element_at(mns, i + 1)) * {SQ_LEVELS}
        + (element_at(mxs, i + 1) - element_at(mns, i + 1)))
       DIV (2 * (element_at(mxs, i + 1) - element_at(mns, i + 1)))
END)
"""


def sq_encode(emb: DataFrame, params: DataFrame | None = None) -> DataFrame:
    """(vec_id, codes array<bigint> of 0..255): the compressed corpus.
    Broadcast params + in-row transform — zero corpus shuffle."""
    if params is None:
        params = sq_train(emb)
    return (
        _micro_vecs(emb)
        .crossJoin(F.broadcast(_as_arrays(params)))
        .select("vec_id", F.expr(_QUANT).alias("codes"))
    )


def sq_codes_long(emb: DataFrame, params: DataFrame | None = None) -> DataFrame:
    """(vec_id, dim, q): the gate-friendly long form."""
    return sq_encode(emb, params).select(
        "vec_id", F.posexplode("codes").alias("dim", "q")
    ).select("vec_id", F.col("dim").cast("long").alias("dim"), "q")


def sq_topk(
    emb: DataFrame,
    k: int = SQ_TOPK,
    n_queries: int = SQ_QUERIES,
    params: DataFrame | None = None,
) -> DataFrame:
    """(qid, nid, rank, d): top-k by quantized squared L2 in micro units
    (directly comparable to ``pq.exact_l2_topk``). Both sides are codes;
    per-dim spans broadcast; the additive offsets cancel so the per-dim
    dequantized diff is ``(abs(qc_i - vc_i) * span_i) DIV 255``."""
    if params is None:
        params = sq_train(emb)
    spans = params.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(dim, mx - mn AS s))), p -> p.s)"
        ).alias("spans")
    )
    codes = sq_encode(emb, params)
    qs = codes.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.col("codes").alias("qcodes")
    )
    scored = (
        codes.crossJoin(F.broadcast(qs))
        .crossJoin(F.broadcast(spans))
        .select(
            "qid",
            F.col("vec_id").alias("nid"),
            F.expr(
                f"aggregate(transform(codes, (c, i) ->"
                f" ((abs(element_at(qcodes, i + 1) - c) * element_at(spans, i + 1))"
                f" DIV {SQ_LEVELS})"
                f" * ((abs(element_at(qcodes, i + 1) - c) * element_at(spans, i + 1))"
                f" DIV {SQ_LEVELS})),"
                " 0L, (a, v) -> a + v)"
            ).alias("d"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.asc("d"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("qid", "nid", "rank", "d")
    )


def sq_recall(
    emb: DataFrame, k: int = SQ_TOPK, n_queries: int = SQ_QUERIES
) -> DataFrame:
    """(qid, hits, k): |SQ8 top-k ∩ exact-L2 top-k| — near-lossless is
    the claim, so on any non-adversarial corpus hits ~= k (contrast with
    the PQ gate, which trades recall for 4x more compression)."""
    from hebrew_ner_spark.operators.pq import exact_l2_topk

    approx = sq_topk(emb, k, n_queries).select("qid", "nid")
    exact = exact_l2_topk(emb, k, n_queries).select("qid", "nid")
    hits = approx.join(exact, ["qid", "nid"]).groupBy("qid").agg(
        F.count("*").alias("h")
    )
    return (
        exact.select("qid")
        .distinct()
        .join(hits, "qid", "left")
        .select(
            "qid",
            F.coalesce(F.col("h"), F.lit(0)).cast("long").alias("hits"),
            F.lit(k).cast("long").alias("k"),
        )
    )
