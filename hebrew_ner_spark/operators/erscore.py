"""Fellegi-Sunter record-linkage scoring (JASA 1969): the principled
match/non-match weight model that turns blocking candidates into
classified pairs.

The ER pipeline so far ships blocking (LSH bands, sorted-neighborhood,
deletion-neighborhood edit join) and exact verification (Jaccard,
Levenshtein); this is the SCORING layer between them — per-field
agreement weights log(m/u) where m = P(agree | match) and
u = P(agree | non-match), summed over fields and thresholded. The
standard decision theory behind every production linker (Splink et al.),
reduced to its engine shape.

Exact-integer formulation (the repo contract; log2 via the bitlen
idiom, the surprisal/Stupid-Backoff precedent):

* u_f from the field's value histogram: collision probability of a
  random doc pair = sum_v c_v(c_v-1) / n(n-1) — one groupBy per field,
  NO pair enumeration (u is quadratic only notationally);
* m_f from the labeled matches the corpus itself provides: exact-text
  duplicate groups (md5 equality — the planted clusters) supply
  sum c(c-1) gold ordered pairs, of which the agreeing count is the
  numerator — again pure aggregation;
* add-one smoothing on both rationals (fields that are functions of
  the text agree on EVERY exact-dup pair, so unsmoothed 1-m = 0);
* w_agree = bitlen(m_num * u_den) - bitlen(m_den * u_num)  (~ log2 m/u)
  w_disagree = the same over the complements (~ log2 (1-m)/(1-u));
* pair score = sum over fields of the applicable weight; match iff
  score >= ER_THRESH.

Shape at 10^12 docs: u/m statistics are histogram-grain aggregations;
the per-field weight table is THREE ROWS (broadcast); scoring touches
only blocking candidates (the capped LSH pair table), each pair one
row through two broadcast-augmented joins on doc_id. Nothing quadratic
ever materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hebrew_ner_spark.operators import dedup, textstats

ER_FIELDS = ("fp", "lang", "lb")
ER_THRESH = 10  # match iff total agreement weight >= this (bit units)


def doc_fields(docs: DataFrame) -> DataFrame:
    """(doc_id, fp, lang, lb) — the comparison vector per document:
    winnowing fingerprint, language tag, token-count bit length."""
    fp = textstats.doc_fingerprints(docs).select("doc_id", F.col("fingerprint").alias("fp"))
    base = docs.select(
        "doc_id",
        "lang",
        F.expr("CAST(length(bin(size(split(text, ' ')))) AS BIGINT)").alias("lb"),
    )
    return base.join(fp, "doc_id")


def _bitlen(col_expr: str) -> str:
    return f"CAST(length(bin({col_expr})) AS BIGINT)"


def field_stats(docs: DataFrame) -> DataFrame:
    """(field, m_num, m_den, u_num, u_den, w_agree, w_disagree) — the
    smoothed Fellegi-Sunter weight table (three rows; ordered-pair
    counts so the /2 cancels)."""
    from hebrew_ner_spark.operators.graphstats import _evict, _persist

    _evict("er_field_stats")
    f = _persist("er_field_stats", doc_fields(docs))
    n = f.select(F.count("*").alias("n"))
    gold = _persist(
        "er_field_stats",
        docs.select(F.md5("text").alias("g"), "doc_id").join(f, "doc_id"),
    )
    out = []
    for field in ER_FIELDS:
        hist = f.groupBy(field).agg(F.count("*").alias("c"))
        u = hist.agg(
            F.sum(F.expr("c * (c - 1)")).cast("long").alias("u_num")
        ).crossJoin(F.broadcast(n)).select(
            "u_num", F.expr("n * (n - 1)").cast("long").alias("u_den")
        )
        # gold ordered pairs per text group: total c(c-1); agreeing on
        # the field: per (g, field-value) sum cv(cv-1)
        gtot = (
            gold.groupBy("g")
            .agg(F.count("*").alias("c"))
            .agg(F.sum(F.expr("c * (c - 1)")).cast("long").alias("m_den"))
        )
        gagr = (
            gold.groupBy("g", field)
            .agg(F.count("*").alias("c"))
            .agg(F.sum(F.expr("c * (c - 1)")).cast("long").alias("m_num"))
        )
        row = (
            u.crossJoin(F.broadcast(gtot))
            .crossJoin(F.broadcast(gagr))
            .select(
                F.lit(field).alias("field"),
                F.coalesce("m_num", F.lit(0)).alias("m_num"),
                F.coalesce("m_den", F.lit(0)).alias("m_den"),
                F.coalesce("u_num", F.lit(0)).alias("u_num"),
                "u_den",
            )
            .select(
                "field",
                "m_num",
                "m_den",
                "u_num",
                "u_den",
                (
                    F.expr(_bitlen("(m_num + 1) * (u_den + 2)"))
                    - F.expr(_bitlen("(m_den + 2) * (u_num + 1)"))
                ).alias("w_agree"),
                (
                    F.expr(_bitlen("(m_den - m_num + 1) * (u_den + 2)"))
                    - F.expr(_bitlen("(m_den + 2) * (u_den - u_num + 1)"))
                ).alias("w_disagree"),
            )
        )
        out.append(row)
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


def pair_scores(docs: DataFrame, thresh: int = ER_THRESH) -> DataFrame:
    """(doc_a, doc_b, score, is_match) — Fellegi-Sunter classification
    of the capped LSH blocking candidates: per-field agreement weights
    summed, thresholded. Field vectors join by doc_id; the three-row
    weight table arrives as a broadcast pivot (one literal-free plan)."""
    fields = doc_fields(docs)
    stats = field_stats(docs)
    wide = stats.groupBy().pivot("field", list(ER_FIELDS)).agg(
        F.first("w_agree").alias("wa"), F.first("w_disagree").alias("wd")
    )
    cand = dedup.lsh_candidate_pairs(docs)
    fa = fields.select(
        F.col("doc_id").alias("doc_a"),
        F.col("fp").alias("fp_a"),
        F.col("lang").alias("lang_a"),
        F.col("lb").alias("lb_a"),
    )
    fb = fields.select(
        F.col("doc_id").alias("doc_b"),
        F.col("fp").alias("fp_b"),
        F.col("lang").alias("lang_b"),
        F.col("lb").alias("lb_b"),
    )
    scored = (
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .crossJoin(F.broadcast(wide))
        .select(
            "doc_a",
            "doc_b",
            (
                F.when(F.col("fp_a") == F.col("fp_b"), F.col("fp_wa")).otherwise(
                    F.col("fp_wd")
                )
                + F.when(
                    F.col("lang_a") == F.col("lang_b"), F.col("lang_wa")
                ).otherwise(F.col("lang_wd"))
                + F.when(F.col("lb_a") == F.col("lb_b"), F.col("lb_wa")).otherwise(
                    F.col("lb_wd")
                )
            )
            .cast("long")
            .alias("score"),
        )
    )
    return scored.select(
        "doc_a",
        "doc_b",
        "score",
        (F.col("score") >= thresh).cast("long").alias("is_match"),
    )


def resolution_pipeline(docs: DataFrame, thresh: int = ER_THRESH) -> DataFrame:
    """(doc_id, component, is_canonical) — the COMPOSED entity-resolution
    lifecycle: LSH blocking -> Fellegi-Sunter scoring -> threshold ->
    connected-components clustering -> canonical selection. Every stage
    is its own gated operator; this gate pins the composition (the
    pipeline a production linker actually runs).

    component = min doc_id reachable through match edges (the CC
    contract), so canonical selection is the zero-cost identity
    ``is_canonical = (doc_id == component)`` — no extra pass. Singletons
    (never blocked or never matched) are their own canonical cluster.
    """
    from hebrew_ner_spark.operators.canonicalize import connected_components

    matches = pair_scores(docs, thresh).where(F.col("is_match") == 1)
    comp = connected_components(
        matches.select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        ),
        "src",
        "dst",
    )
    return (
        docs.select("doc_id")
        .join(comp.withColumnRenamed("vertex", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").cast("long").alias("component"),
        )
        .withColumn(
            "is_canonical",
            (F.col("doc_id") == F.col("component")).cast("long"),
        )
    )
