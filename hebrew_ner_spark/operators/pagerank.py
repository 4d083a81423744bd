"""Entity PageRank over the materialized KG edge table.

The reference stops at emitting labeled spans; a knowledge graph built
at corpus scale immediately needs entity importance for ranking,
canonical-name selection among aliases, and crawl/extraction
prioritization — PageRank over the (subj_id, obj_id, n_evidence)
multigraph is the standard answer. Like every iterative operator here
(connected_components, kmeans_centroids) it is expressed as pure
joins/aggs in EXACT integer arithmetic so a DuckDB oracle can reproduce
it bit-for-bit with the iterations unrolled as CTEs:

- ranks live in micro-units (PR_SCALE = 1e6 per node of initial mass);
- damping 0.85 is the exact rational 85/100 via truncating integer
  division (Spark ``DIV`` == DuckDB ``//`` on non-negatives);
- each edge's contribution is ``(pr_u * w_uv) DIV W_u`` (W_u = total
  outgoing weight) — BIGINT throughout, order-independent under sum.

Scale notes: one shuffle per iteration (contributions keyed by obj_id);
the weighted edge matrix is built once, persisted, and reused across
iterations; per-round eager materialization bounds lineage exactly like
connected_components. Dangling nodes (no outgoing edges) simply leak
their mass — the ranking-semantics choice both engines express
identically with zero extra machinery. Exactness bound: per-edge
products need ``pr_max * w_max < 2^63``; pr_max is at worst ~0.85 x
total initial mass concentrated on one hub, so e.g. a 10^8-entity graph
with hub rank ~10^13 tolerates edge weights to ~10^5 — beyond that,
rescale PR_SCALE down (the oracle scales with it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

PAGERANK_ITERS = 3
PR_SCALE = 1_000_000
PR_BASE = 150_000  # (1 - 0.85) * PR_SCALE, exact
PR_DAMP_NUM = 85  # damping as the exact rational 85/100

# previous invocation's final rank table (see entity_pagerank)
_LAST_PR = None


def entity_pagerank(edges: DataFrame, iters: int = PAGERANK_ITERS) -> DataFrame:
    """(entity_id, pr_1e6): damped PageRank after ``iters`` power
    iterations over the weighted entity multigraph (parallel edges with
    distinct predicates collapse by summed evidence).

    The returned DataFrame is PERSISTED (the final iteration) and the
    rank table is node-sized, so it is NOT collected/rebuilt the way
    ``kmeans_centroids``' broadcast-sized result is. To keep repeated
    invocations (bench reps, gate re-runs) from pinning one table per
    call, the footprint is bounded to ONE rank table per session: the
    previous invocation's result is evicted on re-entry — the same
    discipline as ``labels.alphabet_encode``. Callers needing two live
    rank tables at once should copy the first before recomputing.
    """
    global _LAST_PR
    if _LAST_PR is not None:
        try:
            _LAST_PR.unpersist()
        except Exception:
            pass  # previous SparkSession already stopped; cache died with it
    wm = edges.groupBy("subj_id", "obj_id").agg(
        F.sum("n_evidence").cast("long").alias("ew")
    )
    ow = wm.groupBy("subj_id").agg(F.sum("ew").cast("long").alias("ow"))
    # built once, referenced every iteration — persist or the agg subplan
    # re-executes per round
    wmat = wm.join(ow, "subj_id").persist(StorageLevel.MEMORY_AND_DISK_DESER)
    nodes = (
        wm.select(F.col("subj_id").alias("entity_id"))
        .unionByName(wm.select(F.col("obj_id").alias("entity_id")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK_DESER)
    )
    pr = nodes.select("entity_id", F.lit(PR_SCALE).cast("long").alias("pr"))
    for k in range(iters):
        prev = pr
        contrib = (
            wmat.join(pr.withColumnRenamed("entity_id", "subj_id"), "subj_id")
            .select(
                F.col("obj_id").alias("entity_id"),
                F.expr("(pr * ew) DIV ow").alias("c"),
            )
            .groupBy("entity_id")
            .agg(F.sum("c").cast("long").alias("s"))
        )
        pr = (
            nodes.join(contrib, "entity_id", "left")
            .select(
                "entity_id",
                F.expr(
                    f"CAST({PR_BASE} + ({PR_DAMP_NUM} * coalesce(s, 0L)) DIV 100"
                    " AS BIGINT)"
                ).alias("pr"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK_DESER)
        )
        # eager per-round materialization: bounds the lineage to one join
        # depth per round (the connected_components pattern) and lets the
        # previous round's table be dropped immediately
        pr.count()
        if k > 0:
            prev.unpersist()
    wmat.unpersist()
    nodes.unpersist()
    _LAST_PR = pr
    return pr.select("entity_id", F.col("pr").alias("pr_1e6"))
