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


# ---------------------------------------------------------------------------
# Per-file Bloom skipping (point-lookup file pruning)
# ---------------------------------------------------------------------------

_PAGES_FILES = f"""
    SELECT 'https://example.org/' || lang || '/doc/' || CAST(doc_id AS VARCHAR)
             AS url,
           doc_id // {bf.FILE_CHUNK} AS file_id
    FROM documents
"""

_LOOKUP_KEYS = """
    SELECT 'https://example.org/' || lang || '/doc/' || CAST(doc_id AS VARCHAR)
             AS k
    FROM documents WHERE doc_id % 13 = 0
    UNION ALL
    SELECT 'https://example.org/xx/doc/' || CAST(doc_id AS VARCHAR)
    FROM documents WHERE doc_id % 13 = 0
"""


def _pages_files(spark, sf_dir):
    """The input_hint table laid out write-order clustered: each data
    file holds a contiguous crawl window (FILE_CHUNK docs), so the
    lookup key ``url`` is decorrelated from the layout."""
    from hebrew_ner_spark.operators.extract import synth_webpages

    docs = load_table(spark, sf_dir, "documents")
    pages = synth_webpages(docs)
    return pages.withColumn(
        "file_id",
        F.expr(f"CAST(regexp_extract(url, '/doc/([0-9]+)$', 1) AS BIGINT)"
               f" DIV {bf.FILE_CHUNK}"),
    )


def _lookup_keys(spark, sf_dir):
    """Half present urls (every 13th doc), half provably-absent urls
    (same doc ids under a lang prefix no page has) — so the gate pins
    both the hit path and the skip path."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 13 == 0
    )
    present = docs.select(
        F.concat(
            F.lit("https://example.org/"), F.col("lang"),
            F.lit("/doc/"), F.col("doc_id").cast("string"),
        ).alias("k")
    )
    absent = docs.select(
        F.concat(
            F.lit("https://example.org/xx/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("k")
    )
    return present.unionAll(absent)


@query(
    "flt_file_bloom_scan",
    oracle=f"""
    WITH pages AS ({_PAGES_FILES}),
    keys AS ({_LOOKUP_KEYS}),
    blooms AS ({bf.file_blooms_duck("SELECT * FROM pages")}),
    key_bits AS ({bf.key_bits_duck("SELECT * FROM keys")}),
    need AS (SELECT k, count(*) AS need FROM key_bits GROUP BY k),
    got AS (
      SELECT kb.k, b.file_id, count(*) AS got
      FROM key_bits kb JOIN blooms b USING (bit)
      GROUP BY kb.k, b.file_id
    ),
    scan AS (
      SELECT got.k, got.file_id FROM got
      JOIN need ON got.k = need.k WHERE got.got = need.need
    ),
    truth AS (SELECT url AS k, file_id FROM pages
              WHERE url IN (SELECT k FROM keys))
    SELECT s.k, s.file_id,
           CAST(t.k IS NOT NULL AS BIGINT) AS truth
    FROM scan s
    LEFT JOIN truth t ON s.k = t.k AND s.file_id = t.file_id
    """,
)
def flt_file_bloom_scan(spark, sf_dir):
    """Per-(lookup-key, file) scan decisions from the per-file Bloom
    blobs, flagged with ground truth (the file really contains the
    key). truth=0 rows are the deterministic false positives (wasted
    file opens); every truth pair is present by Bloom construction —
    the no-false-negative invariant pytest pins structurally."""
    pages = _pages_files(spark, sf_dir)
    blooms = bf.file_blooms(pages)
    scan = bf.bloom_point_lookup(blooms, _lookup_keys(spark, sf_dir))
    truth = pages.select(F.col("url").alias("k"), "file_id").join(
        F.broadcast(_lookup_keys(spark, sf_dir).distinct()), "k", "left_semi"
    ).withColumn("hit", F.lit(1).cast("long"))
    return (
        scan.join(truth, ["k", "file_id"], "left")
        .select("k", "file_id", F.coalesce("hit", F.lit(0)).cast("long").alias("truth"))
    )


@query(
    "flt_file_bloom_payoff",
    oracle=f"""
    WITH pages AS ({_PAGES_FILES}),
    keys AS ({_LOOKUP_KEYS}),
    blooms AS ({bf.file_blooms_duck("SELECT * FROM pages")}),
    key_bits AS ({bf.key_bits_duck("SELECT * FROM keys")}),
    need AS (SELECT k, count(*) AS need FROM key_bits GROUP BY k),
    got AS (
      SELECT kb.k, b.file_id, count(*) AS got
      FROM key_bits kb JOIN blooms b USING (bit)
      GROUP BY kb.k, b.file_id
    ),
    scan AS (
      SELECT got.k, got.file_id FROM got
      JOIN need ON got.k = need.k WHERE got.got = need.need
    ),
    truth AS (SELECT url AS k, file_id FROM pages
              WHERE url IN (SELECT k FROM keys))
    SELECT (SELECT count(*) FROM keys) AS n_keys,
           (SELECT count(DISTINCT file_id) FROM pages) AS n_files,
           (SELECT count(*) FROM scan) AS pairs_scanned,
           (SELECT count(*) FROM truth) AS pairs_hit,
           (SELECT count(*) FROM scan) - (SELECT count(*) FROM truth)
             AS false_positives,
           CAST((2 * ((SELECT count(*) FROM keys)
                       * (SELECT count(DISTINCT file_id) FROM pages)
                       - (SELECT count(*) FROM scan)) * 1000000
                 + (SELECT count(*) FROM keys)
                   * (SELECT count(DISTINCT file_id) FROM pages))
               // (2 * (SELECT count(*) FROM keys)
                     * (SELECT count(DISTINCT file_id) FROM pages))
               AS BIGINT) AS skip_share_1e6
    """,
)
def flt_file_bloom_payoff(spark, sf_dir):
    """The planner's headline for the point-lookup plane: of
    n_keys x n_files candidate file opens, how many the blobs skip.
    skip_share is half-up integer micro-units; false_positives =
    scanned minus true hits (absent keys' survivals + present keys'
    extra files)."""
    pages = _pages_files(spark, sf_dir)
    keys = _lookup_keys(spark, sf_dir)
    blooms = bf.file_blooms(pages)
    scan = bf.bloom_point_lookup(blooms, keys)
    truth = pages.select(F.col("url").alias("k"), "file_id").join(
        F.broadcast(keys.distinct()), "k", "left_semi"
    )
    counts = (
        keys.agg(F.count("*").alias("n_keys"))
        .crossJoin(pages.agg(F.countDistinct("file_id").alias("n_files")))
        .crossJoin(scan.agg(F.count("*").alias("pairs_scanned")))
        .crossJoin(truth.agg(F.count("*").alias("pairs_hit")))
    )
    out = counts.select(
        "n_keys", "n_files", "pairs_scanned", "pairs_hit",
        (F.col("pairs_scanned") - F.col("pairs_hit")).alias("false_positives"),
        F.expr(
            "CAST((2 * (n_keys * n_files - pairs_scanned) * 1000000"
            " + n_keys * n_files)"
            " DIV (2 * n_keys * n_files) AS BIGINT)"
        ).alias("skip_share_1e6"),
    )
    return out
