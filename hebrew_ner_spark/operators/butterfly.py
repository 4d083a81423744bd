"""Butterfly (2x2-biclique) counting over a bipartite graph — the
bipartite analogue of triangle counting, and the standard cohesion
measure for entity-document / host-resource incidence structures
(Sanei-Mehri, Sariyuce & Tirthapura, SIGMOD 2018). A butterfly is two
left vertices sharing two right vertices: the smallest unit of
bipartite clustering, and the raw material of (i, j)-core trawling
(bipcore.py finds the cores; this counts the cohesion that forms
them).

Algorithm (exact, join-based): pivot on the RIGHT side — every right
vertex of degree d contributes C(d, 2) wedges (left-pairs); grouping
wedges by the left pair gives the co-occurrence count c, and each pair
contributes C(c, 2) butterflies. All counts are exact integers
(c * (c - 1) DIV 2 — no floats anywhere).

Skew is the whole game at scale: a boilerplate right vertex of degree
10^6 would emit 5 * 10^11 wedge rows. The operator therefore takes the
package's hard-cap-with-loud-overflow contract (the
emb_near_dups / dedup LSH precedent): right vertices with degree above
``max_right_deg`` are EXCLUDED from wedge generation and surfaced by
``butterfly_overflow`` — never silently dropped, never enumerated.
Under the cap, wedge volume is bounded by cap * |E| (each edge meets
at most cap - 1 partners per right vertex); the wedge groupBy is a
plain shuffle on the (e1, e2) pair key, salting-compatible like every
pair aggregation in the package. The pivot side is chosen by the
caller (the canonical Sanei-Mehri optimization: pivot the side
minimizing sum C(deg, 2) — here the right/doc side, whose degree is
bounded by the token vocabulary, vs the unbounded entity side).

Cites Sanei-Mehri-Sariyuce-Tirthapura (SIGMOD 2018) and Wang et al.
(VLDB 2019, vertex-priority butterfly counting) for what is computed.
No reference counterpart; extends the bipartite toolkit
(operators/bipcore.py) per SURVEY.md's web-scale extension plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BF_MAX_RIGHT_DEG = 256  # wedge-generation ceiling per right vertex


def _eligible(edges: DataFrame, max_right_deg: int) -> DataFrame:
    """Edges restricted to right vertices at or under the degree cap."""
    rdeg = edges.groupBy("right").agg(F.count("*").cast("long").alias("rdeg"))
    return edges.join(
        rdeg.where(F.col("rdeg") <= max_right_deg).select("right"), "right"
    )


def _pair_counts(edges: DataFrame, max_right_deg: int) -> DataFrame:
    """(e1, e2, c) — co-occurrence count per left pair (e1 < e2) via
    the right-pivot wedge join over cap-eligible right vertices."""
    ok = _eligible(edges, max_right_deg)
    a = ok.select("right", F.col("left").alias("e1"))
    b = ok.select("right", F.col("left").alias("e2"))
    return (
        a.join(b, "right")
        .where(F.col("e1") < F.col("e2"))
        .groupBy("e1", "e2")
        .agg(F.count("*").cast("long").alias("c"))
    )


def butterfly_stats(
    edges: DataFrame, max_right_deg: int = BF_MAX_RIGHT_DEG
) -> DataFrame:
    """One row (n_left, n_right, n_edges, wedges, pairs, butterflies)
    — the global butterfly census over cap-eligible right vertices:
    wedges = sum C(rdeg, 2), pairs = co-occurring left pairs,
    butterflies = sum C(c, 2).

    The eligible-edge table is persisted for the census (one corpus
    pass feeds all three aggregate legs — unpersisted, Catalyst plans
    three independent scans of the tokenize/explode subtree; measured
    17 exchanges vs 7 after the persist)."""
    from hebrew_ner_spark.operators.graphstats import _evict, _persist

    _evict("butterfly")
    ok = _persist("butterfly", _eligible(edges, max_right_deg))
    a = ok.select("right", F.col("left").alias("e1"))
    b = ok.select("right", F.col("left").alias("e2"))
    pc = (
        a.join(b, "right")
        .where(F.col("e1") < F.col("e2"))
        .groupBy("e1", "e2")
        .agg(F.count("*").cast("long").alias("c"))
    )
    base = ok.agg(
        F.countDistinct("left").cast("long").alias("n_left"),
        F.countDistinct("right").cast("long").alias("n_right"),
        F.count("*").cast("long").alias("n_edges"),
    )
    wedges = (
        ok.groupBy("right")
        .agg(F.count("*").alias("d"))
        .agg(
            F.coalesce(F.sum(F.expr("d * (d - 1) DIV 2")), F.lit(0))
            .cast("long")
            .alias("wedges")
        )
    )
    bf = pc.agg(
        F.coalesce(F.count("*"), F.lit(0)).cast("long").alias("pairs"),
        F.coalesce(F.sum(F.expr("c * (c - 1) DIV 2")), F.lit(0))
        .cast("long")
        .alias("butterflies"),
    )
    return base.crossJoin(wedges).crossJoin(bf)


def butterfly_degrees(
    edges: DataFrame, max_right_deg: int = BF_MAX_RIGHT_DEG
) -> DataFrame:
    """(left, wedges, butterflies) — per-left-vertex participation:
    wedges = sum over incident right vertices of (rdeg - 1),
    butterflies = sum over partners of C(c, 2). Left vertices with no
    butterfly still appear (0 rows matter: they flag isolated
    entities)."""
    ok = _eligible(edges, max_right_deg)
    rdeg = ok.groupBy("right").agg(F.count("*").cast("long").alias("rdeg"))
    wedges = (
        ok.join(rdeg, "right")
        .groupBy("left")
        .agg(F.sum(F.col("rdeg") - 1).cast("long").alias("wedges"))
    )
    pc = _pair_counts(edges, max_right_deg)
    per_side = pc.select(
        F.col("e1").alias("left"), F.expr("c * (c - 1) DIV 2").alias("b")
    ).unionAll(
        pc.select(F.col("e2").alias("left"), F.expr("c * (c - 1) DIV 2").alias("b"))
    )
    bf = per_side.groupBy("left").agg(F.sum("b").cast("long").alias("butterflies"))
    return (
        wedges.join(bf, "left", "left")
        .select(
            "left",
            "wedges",
            F.coalesce("butterflies", F.lit(0)).cast("long").alias("butterflies"),
        )
    )


def butterfly_overflow(
    edges: DataFrame, max_right_deg: int = BF_MAX_RIGHT_DEG
) -> DataFrame:
    """(right, rdeg) — right vertices over the wedge-generation cap:
    the non-silent exclusion report (they are absent from every count
    above at the same cap)."""
    return (
        edges.groupBy("right")
        .agg(F.count("*").cast("long").alias("rdeg"))
        .where(F.col("rdeg") > max_right_deg)
    )


def entity_doc_edges(docs: DataFrame) -> DataFrame:
    """(left = entity, right = doc_id) — the entity-document incidence
    bipartite graph (distinct pairs), the butterfly gates' input."""
    from hebrew_ner_spark.operators.maxcover import entity_doc_sets

    return entity_doc_sets(docs).select(
        F.col("entity").alias("left"), F.col("doc_id").alias("right")
    )
