"""Bloom-filter runtime-pruning gates + DuckDB oracles.

Three complementary proofs (operators/bloomfilter.py):

* ``flt_bloom_bits``  — the bitset itself, bit-for-bit cross-engine
  (portable md5 hash replayed by the oracle).
* ``flt_bloom_fp``    — membership semantics at a deliberately tiny
  m=64: survivors carry an exact-membership flag, so the deterministic
  FALSE-POSITIVE set is pinned cross-engine (and pytest asserts it is
  non-empty — the gate cannot go vacuous silently).
* ``flt_bloom_join_equiv`` — the end-to-end invariant that makes the
  rewrite safe: bloom-pruned join == plain join. The oracle is the
  PLAIN join (no bloom anywhere in the SQL), so a single false
  negative fails the value hash.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hebrew_ner_spark.operators import bloomfilter as bf
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.resources import ENTITY_TERMS
from hebrew_ner_spark.sources.catalog import load_table

_URGENT = "SELECT CAST(o_orderkey AS VARCHAR) AS k FROM orders WHERE o_orderpriority = '1-URGENT'"

_TERMS_VALUES = ", ".join(f"('{t}')" for t in sorted(ENTITY_TERMS))

_TOKS = """
    SELECT DISTINCT t.token FROM documents,
    LATERAL (SELECT unnest(string_split(text, ' ')) AS token) t
    WHERE t.token <> ''
"""


def _urgent_orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )


def _terms_df(spark):
    return spark.createDataFrame(
        [(t,) for t in sorted(ENTITY_TERMS)], "term string"
    )


def _doc_tokens(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .distinct()
    )


@query(
    "flt_bloom_bits",
    oracle=f"""
    SELECT DISTINCT bit FROM (
      {bf.bloom_bits_duck(_URGENT, "k")}
    )
    """,
)
def flt_bloom_bits(spark, sf_dir):
    return bf.bloom_bits(_urgent_orders(spark, sf_dir), "o_orderkey")


@query(
    "flt_bloom_fp",
    oracle=f"""
    WITH terms(term) AS (VALUES {_TERMS_VALUES}),
    toks AS ({_TOKS}),
    bits AS (SELECT DISTINCT bit FROM (
      {bf.bloom_bits_duck("SELECT term AS k FROM terms", "k", m=bf.FP_M)}
    ))
    SELECT token,
           CAST(token IN (SELECT term FROM terms) AS BIGINT) AS in_dict
    FROM toks
    WHERE {bf.bloom_member_duck("token", "bits", m=bf.FP_M)}
    """,
)
def flt_bloom_fp(spark, sf_dir):
    """Survivors of a deliberately small (m=64) entity-term bloom over
    the distinct document tokens, flagged with exact membership — the
    rows where in_dict = false are the filter's false positives,
    deterministic and replayed by the oracle."""
    terms = _terms_df(spark)
    bits = bf.bloom_bits(terms, "term", m=bf.FP_M)
    surv = bf.bloom_prune(_doc_tokens(spark, sf_dir), "token", bits, m=bf.FP_M)
    return surv.join(
        F.broadcast(terms), surv.token == terms.term, "left"
    ).select("token", F.col("term").isNotNull().cast("long").alias("in_dict"))


@query(
    "flt_bloom_join_equiv",
    oracle="""
    SELECT o.o_orderstatus,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents,
           count(*) AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY o.o_orderstatus
    """,
)
def flt_bloom_join_equiv(spark, sf_dir):
    """Urgent-order revenue where lineitem is bloom-pruned BEFORE the
    join; the oracle is the plain unpruned join, so this gate pins the
    no-false-negative invariant end to end."""
    orders = _urgent_orders(spark, sf_dir)
    bits = bf.bloom_bits(orders, "o_orderkey")
    li = bf.bloom_prune(
        load_table(spark, sf_dir, "lineitem"), "l_orderkey", bits
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long").alias("revenue_cents"),
            F.count("*").alias("n_lines"),
        )
    )
