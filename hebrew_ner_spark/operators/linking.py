"""Entity linking: tiered alias-dictionary resolution of mention surfaces.

Reference pattern J7 (utils/functions.py:167-195): the embedding-matrix
build joins vocab against pretrained vectors with *tiered* fallbacks —
exact match, then lowercase match, then random init. Our linking stage
follows exactly that shape against a canonical-entity dimension:

  tier 1: surface == canonical_name           (exact)
  tier 2: surface == lower(canonical_name)    (case-normalized)
  tier 3: head-token linking — the mention's first token resolved through
          tiers 1-2 (the deterministic stand-in for the MinHash-LSH
          similarity tier; the LSH machinery itself is exercised by the
          dedup_* operators over the same hash infrastructure)

All three tiers are **broadcast** joins (the dimension is tiny vs the
mention table — at 10^12 docs the alias dictionary still fits in tens of
MB); resolution precedence is a coalesce over the tier outputs, so the
whole resolver is one narrow stage after the mention-span shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hebrew_ner_spark.operators import kg
from hebrew_ner_spark.resources import ENTITY_TERMS


def entity_dim(spark: SparkSession) -> DataFrame:
    """Canonical entity dimension: (entity_id, canonical_name).

    ids follow alphabetical order (deterministic, resume-stable); the
    first half keep their lowercase surface as canonical, the second half
    are capitalized — so tier 1 and tier 2 both have real work to do.
    """
    terms = sorted(ENTITY_TERMS)
    half = len(terms) // 2
    rows = [
        (i + 1, t if i < half else t.capitalize())
        for i, t in enumerate(terms)
    ]
    return spark.createDataFrame(rows, "entity_id long, canonical_name string")


def link_mentions(mentions: DataFrame, dim: DataFrame) -> DataFrame:
    """(doc_id, lo, hi, surface, entity_id, tier) — tiered resolution.

    ``mentions`` needs (doc_id, lo, hi, surface). Unresolved mentions keep
    entity_id NULL with tier 0 (the reference's random-init tier becomes
    an explicit unlinked marker — at KG scale you want them countable).
    """
    d1 = F.broadcast(dim.select(F.col("canonical_name").alias("_n1"), F.col("entity_id").alias("_e1")))
    d2 = F.broadcast(
        dim.select(F.lower("canonical_name").alias("_n2"), F.col("entity_id").alias("_e2"))
    )
    head = F.element_at(F.split(F.col("surface"), " "), 1)
    out = (
        mentions.join(d1, F.col("surface") == F.col("_n1"), "left")
        .join(d2, F.col("surface") == F.col("_n2"), "left")
        .join(
            F.broadcast(dim.select(F.lower("canonical_name").alias("_n3"), F.col("entity_id").alias("_e3"))),
            head == F.col("_n3"),
            "left",
        )
    )
    return out.select(
        "doc_id",
        "lo",
        "hi",
        "surface",
        F.coalesce("_e1", "_e2", "_e3").alias("entity_id"),
        F.when(F.col("_e1").isNotNull(), 1)
        .when(F.col("_e2").isNotNull(), 2)
        .when(F.col("_e3").isNotNull(), 3)
        .otherwise(0)
        .cast("long")
        .alias("tier"),
    )


def linked_mentions(docs: DataFrame) -> DataFrame:
    """Full chain: mention spans -> tiered linking."""
    spans = kg.mention_spans(docs).select("doc_id", "lo", "hi", "surface")
    return link_mentions(spans, entity_dim(docs.sparkSession))


def kg_nodes(docs: DataFrame) -> DataFrame:
    """Materialized node table: (entity_id, canonical_name, n_mentions,
    n_docs) — SURVEY.md §7 stage 9; two global aggregates, the mention
    count salted-safe (counts are algebraic)."""
    linked = linked_mentions(docs).where(F.col("entity_id").isNotNull())
    dim = entity_dim(docs.sparkSession)
    agg = linked.groupBy("entity_id").agg(
        F.count("*").alias("n_mentions"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    return agg.join(F.broadcast(dim), "entity_id").select(
        "entity_id", "canonical_name", "n_mentions", "n_docs"
    )


def kg_edges(docs: DataFrame) -> DataFrame:
    """Materialized edge table: (subj_id, pred, obj_id, n_evidence).

    Triples' subject/object surfaces resolve through the same tiered
    dictionary (single-token surfaces -> tiers 1-2 suffice); the final
    count is the two-phase-friendly aggregate.
    """
    spark = docs.sparkSession
    dim = entity_dim(spark)
    lower_dim = F.broadcast(
        dim.select(F.lower("canonical_name").alias("_name"), "entity_id")
    )
    triples = kg.doc_triples(docs)
    s = lower_dim.select(F.col("_name").alias("subj"), F.col("entity_id").alias("subj_id"))
    o = lower_dim.select(F.col("_name").alias("obj"), F.col("entity_id").alias("obj_id"))
    return (
        triples.join(F.broadcast(s), "subj")
        .join(F.broadcast(o), "obj")
        .groupBy("subj_id", "pred", "obj_id")
        .agg(F.count("*").alias("n_evidence"))
    )
