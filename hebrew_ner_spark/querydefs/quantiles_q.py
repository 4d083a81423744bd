"""Exact-quantile / histogram gates + DuckDB oracles
(operators/quantiles.py): percentile_disc in pure integers over the
value histogram, and the log2-bucketed shape read."""

from __future__ import annotations

from pyspark.sql import functions as F

from hebrew_ner_spark.operators import quantiles as qt
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table

_QS_VALUES = ", ".join(f"({q})" for q in qt.QUANTILES)

_HIST = """
    SELECT lang, CAST(length(text) AS BIGINT) AS v, count(*) AS cnt
    FROM documents GROUP BY lang, v
"""


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@query(
    "sk_len_quantiles",
    oracle=f"""
    WITH hist AS ({_HIST}),
    cum AS (SELECT lang, v,
                   sum(cnt) OVER (PARTITION BY lang ORDER BY v) AS cum,
                   sum(cnt) OVER (PARTITION BY lang) AS total
            FROM hist),
    qs(q) AS (VALUES {_QS_VALUES})
    SELECT lang, CAST(q AS BIGINT) AS q, min(v) AS v
    FROM cum JOIN qs ON 100 * cum >= q * total
    GROUP BY lang, q
    """,
)
def sk_len_quantiles(spark, sf_dir):
    return qt.exact_quantiles(_docs(spark, sf_dir), "lang", F.length("text"))


@query(
    "sk_len_log2_hist",
    oracle="""
    SELECT lang,
           CAST(CASE WHEN v <= 0 THEN 0 ELSE length(bin(v)) END AS BIGINT)
             AS bucket,
           count(*) AS n
    FROM (SELECT lang, CAST(length(text) AS BIGINT) AS v FROM documents)
    GROUP BY lang, bucket
    """,
)
def sk_len_log2_hist(spark, sf_dir):
    return qt.log2_histogram(_docs(spark, sf_dir), "lang", F.length("text"))


@query(
    "sk_weighted_quantiles",
    oracle=f"""
    WITH wq_h AS (
      SELECT lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS v,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS wsum
      FROM documents GROUP BY lang, v
    ),
    wq_c AS (SELECT lang, v,
                    sum(wsum) OVER (PARTITION BY lang ORDER BY v) AS cum,
                    sum(wsum) OVER (PARTITION BY lang) AS total
             FROM wq_h),
    wq_q(q) AS (VALUES {_QS_VALUES})
    SELECT lang, CAST(q AS BIGINT) AS q, min(v) AS v
    FROM wq_c JOIN wq_q ON 100 * cum >= q * total
    GROUP BY lang, q
    """,
)
def sk_weighted_quantiles(spark, sf_dir):
    """Token-mass-weighted document-length percentiles per language:
    the smallest length whose cumulative TOKEN weight reaches q% — what
    sizes batches/shards, since cost follows tokens, not doc counts
    (operators/quantiles.py weighted_quantiles; collapse to value grain
    first, weights sum map-side)."""
    d = _docs(spark, sf_dir)
    n = F.size(F.split("text", " "))
    return qt.weighted_quantiles(d, "lang", n, n)
