"""Distributed Borůvka minimum-spanning-forest + single-linkage
clustering over weighted similarity graphs.

Why this is engine work: single-linkage clustering — the dendrogram
behind near-duplicate cluster merging, entity-similarity grouping, and
host-backbone extraction — IS the minimum spanning forest: cutting the
MSF at threshold t yields exactly the connected components of the
t-thresholded similarity graph, so one MSF build answers EVERY
threshold afterwards (the classic SLINK ≡ MST equivalence). A
sequential Kruskal/Prim does not distribute; Borůvka does, because its
unit of work is per-component and every round is plain joins +
aggregates:

    round: every component selects its minimum-weight outgoing edge
           (one groupBy-min over the crossing-edge list), the selected
           edges join components (one connected-components pass over
           the COMPONENT-grain graph — exponentially smaller each
           round), labels update through one join.

Component count at least halves per round, so O(log |V|) rounds; each
round's shuffles are keyed by vertex/component id. Rounds go through
the shared lineage breaker (localCheckpoint locally, reliable round
tables under ``spark.graft.cc.reliable=true`` — the
`operators/canonicalize.py` discipline), and exhausting the round
budget RAISES rather than returning a partial forest.

Determinism: edge weights must be UNIQUE (the gate's synthesis encodes
the endpoint pair into the low bits, so uniqueness is closed-form).
Under a total order on edges the MSF is unique — which is what lets
the gate's oracle characterize it WITHOUT running any MST algorithm:
an edge (a, b, w) is in the MSF iff w equals the MINIMAX distance
between a and b (the min over paths of the max edge weight), computed
by (min, max)-semiring doubling — a genuinely different algorithm.

No reference counterpart (the reference has no graph clustering); this
is the KG-side single-linkage the north rule's canonicalization stage
implies for similarity graphs, sitting next to the exact-closure CC of
`operators/canonicalize.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hebrew_ner_spark.operators.canonicalize import (
    _lineage_breaker,
    connected_components,
)

MST_MAX_ROUNDS = 12


def boruvka_msf(
    edges: DataFrame,
    max_rounds: int = MST_MAX_ROUNDS,
    reliable: bool | None = None,
) -> DataFrame:
    """(a, b, wu) — the minimum spanning forest of an undirected
    weighted edge list with UNIQUE weights ``wu`` (a < b). Isolated
    vertices simply contribute no edges."""
    spark = edges.sparkSession
    _break = _lineage_breaker(edges, reliable)
    e = edges.select("a", "b", "wu").persist()
    comp = _break(
        e.select(F.col("a").alias("vertex"))
        .union(e.select("b"))
        .distinct()
        .withColumn("component", F.col("vertex"))
    )
    msf = spark.createDataFrame([], "a long, b long, wu long")
    for _ in range(max_rounds):
        ca = comp.select(F.col("vertex").alias("a"), F.col("component").alias("ca"))
        cb = comp.select(F.col("vertex").alias("b"), F.col("component").alias("cb"))
        crossing = e.join(ca, "a").join(cb, "b").where(F.col("ca") != F.col("cb"))
        s = F.struct("wu", "a", "b", "ca", "cb").alias("s")
        cand = crossing.select(F.col("ca").alias("c"), s).union(
            crossing.select(F.col("cb").alias("c"), s)
        )
        # wu is globally unique, so min(struct) is a total order and the
        # per-component pick is deterministic. Materializing sel through
        # the breaker doubles as the termination probe — no separate
        # crossing-emptiness job per round.
        sel = _break(
            cand.groupBy("c")
            .agg(F.min("s").alias("s"))
            .select("s.a", "s.b", "s.wu", "s.ca", "s.cb")
            .distinct()
        )
        if not sel.head(1):
            e.unpersist()
            return msf
        msf = _break(msf.unionByName(sel.select("a", "b", "wu")))
        # contract: hook selected edges at COMPONENT grain (per-round
        # graph is component-count-sized, halving every round)
        merged = connected_components(
            sel.select("ca", "cb"), src="ca", dst="cb", reliable=reliable
        )
        comp = _break(
            comp.join(
                merged, comp["component"] == merged["vertex"], "left"
            ).select(
                comp["vertex"],
                F.coalesce(merged["component"], comp["component"]).alias(
                    "component"
                ),
            )
        )
    e.unpersist()
    raise RuntimeError(
        f"boruvka_msf did not converge in {max_rounds} rounds — raising "
        "rather than returning a partial forest"
    )


def single_linkage_clusters(
    edges: DataFrame,
    msf: DataFrame,
    threshold_expr,
) -> DataFrame:
    """(vertex, cluster) — single-linkage clusters at a threshold: the
    connected components of the MSF edges passing ``threshold_expr``
    (a boolean Column over the msf columns). Every vertex of the FULL
    edge list appears; vertices whose incident MSF edges are all cut
    become singletons. Equal, by the SLINK ≡ MST equivalence, to the
    components of the thresholded ORIGINAL graph — which is exactly how
    the gate's oracle computes it."""
    kept = msf.where(threshold_expr)
    labels = connected_components(kept, src="a", dst="b")
    verts = (
        edges.select(F.col("a").alias("vertex"))
        .union(edges.select("b"))
        .distinct()
    )
    return verts.join(labels, "vertex", "left").select(
        "vertex",
        F.coalesce("component", "vertex").alias("cluster"),
    )


SL_TAU = 48  # single-linkage threshold on the base weight (1..97)


def weighted_host_edges(docs: DataFrame) -> DataFrame:
    """(a, b, wb, wu) — the planted-farm host graph with deterministic
    base weights wb = ((37a + 53b) mod 97) + 1 and UNIQUE total-order
    weights wu = wb * H^2 + a * H + b (the endpoint pair rides in the
    low bits, so uniqueness is closed-form — no window, no hash)."""
    from hebrew_ner_spark.operators.weblinks import (
        FARM_HOSTS,
        synth_farm_host_edges,
    )

    e = synth_farm_host_edges(docs)
    wb = (F.col("a") * 37 + F.col("b") * 53) % 97 + 1
    return e.select(
        "a",
        "b",
        wb.cast("long").alias("wb"),
        (wb * FARM_HOSTS * FARM_HOSTS + F.col("a") * FARM_HOSTS + F.col("b"))
        .cast("long")
        .alias("wu"),
    )
