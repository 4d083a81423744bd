"""SimRank node similarity over a directed (src, dst) graph (Jeh &
Widom, KDD 2002): two nodes are similar if their in-neighbors are
similar.

The principled recursive counterpart to the one-shot structural
signatures already shipped (``kg.node_signatures`` SRP over PMI vectors
approximates role similarity; ``weblinks`` mirror-host detection finds
content twins): SimRank scores *link-structural* equivalence — two
entities referenced by the same (or similar) referrers — the
entity-dedup candidate signal that separates a genuine alias from a
content coincidence. Gated over the deterministic sparse directed
graph (``graphstats.synth_sparse_edges``) for the same reason
``kg_bounded_reach`` is: the organic 18-entity graph is near-complete,
which makes every pair's in-neighborhood identical and the measure
degenerate.

Exact-integer formulation (micro-units, the repo-wide contract):

    s_0(a,a) = 1e6;  s_0(a,b) = 0
    s_k(a,b) = (C_NUM * sum_{i in I(a), j in I(b)} s_{k-1}(i,j))
                 DIV (C_DEN * |I(a)| * |I(b)|)          for a != b

with C = C_NUM/C_DEN = 0.8 and ITERS = 2 unrolled rounds. All sums and
divisions are int64; the DuckDB oracle replays the identical unrolled
rounds, and pytest pins the closed forms independently (common-parent
count / (da*db) after round 1; the two-level propagation after round 2).

Shape at 10^12 pages (host grain — the graph is node-bounded, not
page-bounded):

* in-neighbor lists stay as EDGES; each round is two edge-keyed joins
  (score pair -> ordered parent orientations -> children) + one
  (a, b)-keyed aggregation — never a per-node neighbor-array blowup;
* the quadratic hazard is hub in-degree: a node with in-degree d
  contributes d^2 join rows per scored parent pair, so nodes above
  ``max_deg`` are EXCLUDED from the iteration and surfaced count-only
  by ``simrank_overflow`` (the dedup-cap contract; at web scale the
  standard move is exactly this — SimRank prunes hubs or samples,
  because wikipedia.org's in-neighborhood says nothing discriminative);
* scores stay sparse: only pairs with a length-<=k common-ancestor
  witness ever materialize; everything else is an implicit 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SR_C_NUM = 8      # decay C = 0.8
SR_C_DEN = 10
SR_ITERS = 2
SR_MAX_DEG = 64   # hub in-degree exclusion ceiling
SR_UNIT = 1_000_000
SR_MOD = 128      # edge-index modulus (the scale-stability trick)


def synth_sr_edges(docs: DataFrame) -> DataFrame:
    """(src, dst): the deterministic SimRank test graph — 123 fixed
    edges over ~60 nodes, derived from doc_id the bounded_reach way
    (edge = pure function of ``doc_id % SR_MOD``, so the graph is
    IDENTICAL at every scale factor once the corpus covers the residues).

    Why not reuse ``graphstats.synth_sparse_edges``: that graph is a
    permutation (every in-degree exactly 1, dst a function of src), so
    no two nodes share an in-neighbor and SimRank is identically zero;
    the organic entity graph is the opposite failure (near-complete, all
    in-neighborhoods equal). Here src = (5r) % 61 gives each parent ~2
    children (shared-parent pairs exist -> round 1 fires) and
    dst = (r^2+3r+1) % 64 collides unevenly (in-degrees 2-4 -> the
    normalization denominators differ), with both endpoints in one node
    namespace so round 2 has real two-level propagation (106 of the 140
    scored pairs at sf0.01 exist ONLY through round 2)."""
    r = F.col("doc_id") % SR_MOD
    src_i = (r * 5) % 61
    dst_i = (r * r + 3 * r + 1) % 64
    return (
        docs.select(
            F.concat(F.lit("n"), src_i.cast("string")).alias("src"),
            F.concat(F.lit("n"), dst_i.cast("string")).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def in_edges(edges: DataFrame, max_deg: int = SR_MAX_DEG) -> DataFrame:
    """(node, parent, deg) — distinct in-edges with the node's in-degree
    attached, hub nodes (deg > max_deg) excluded from the iteration."""
    ine = edges.select(
        F.col("dst").alias("node"), F.col("src").alias("parent")
    ).distinct()
    deg = ine.groupBy("node").agg(F.count("*").alias("deg"))
    return (
        ine.join(deg, "node")
        .where(F.col("deg") <= max_deg)
        .select("node", "parent", "deg")
    )


def simrank_overflow(edges: DataFrame, max_deg: int = SR_MAX_DEG) -> DataFrame:
    """(node, in_deg) — hubs the iteration excluded (count-only)."""
    ine = edges.select(
        F.col("dst").alias("node"), F.col("src").alias("parent")
    ).distinct()
    return (
        ine.groupBy("node")
        .agg(F.count("*").alias("in_deg"))
        .where(F.col("in_deg") > max_deg)
    )


def _swap_closure(scores: DataFrame, nodes: DataFrame) -> DataFrame:
    """Symmetric + diagonal view (i, j, s) of the canonical a<b store —
    the ordered-orientation table one SimRank round consumes."""
    diag = nodes.select(
        F.col("node").alias("i"),
        F.col("node").alias("j"),
        F.lit(SR_UNIT).cast("long").alias("s"),
    )
    fwd = scores.select(
        F.col("node_a").alias("i"), F.col("node_b").alias("j"), F.col("s_1e6").alias("s")
    )
    rev = scores.select(
        F.col("node_b").alias("i"), F.col("node_a").alias("j"), F.col("s_1e6").alias("s")
    )
    return diag.unionByName(fwd).unionByName(rev)


def simrank_scores(
    edges: DataFrame,
    iters: int = SR_ITERS,
    max_deg: int = SR_MAX_DEG,
) -> DataFrame:
    """(node_a, node_b, s_1e6) — SimRank after ``iters`` rounds,
    canonical node_a < node_b, zero scores omitted.

    Each round: orientation-closed prior scores join the in-edge table
    twice (parent i -> child a, parent j -> child b), aggregate per
    (a, b), then the exact-integer decay/normalize. Rounds are unrolled
    into one plan (iters is 2-3 by construction — SimRank's effective
    radius; deeper propagation belongs to the walk-PMI family)."""
    ine = in_edges(edges, max_deg)
    # the diagonal universe is EVERY surviving endpoint: s(i,i) = 1 holds
    # for source-only nodes too, and their diagonal mass feeds round 1 of
    # every child pair they co-reference
    nodes = (
        ine.select("node")
        .unionByName(ine.select(F.col("parent").alias("node")))
        .distinct()
    )
    scores = nodes.limit(0).select(
        F.col("node").alias("node_a"),
        F.col("node").alias("node_b"),
        F.lit(0).cast("long").alias("s_1e6"),
    )
    ia = ine.select(
        F.col("parent").alias("i"),
        F.col("node").alias("a"),
        F.col("deg").alias("da"),
    )
    jb = ine.select(
        F.col("parent").alias("j"),
        F.col("node").alias("b"),
        F.col("deg").alias("db"),
    )
    for _ in range(iters):
        s2 = _swap_closure(scores, nodes)
        contrib = (
            s2.join(ia, "i")
            .join(jb, "j")
            .where(F.col("a") < F.col("b"))
            .groupBy("a", "b", "da", "db")
            .agg(F.sum("s").alias("tot"))
        )
        scores = contrib.select(
            F.col("a").alias("node_a"),
            F.col("b").alias("node_b"),
            F.expr(
                f"(CAST({SR_C_NUM} AS BIGINT) * tot)"
                f" DIV (CAST({SR_C_DEN} AS BIGINT) * da * db)"
            ).alias("s_1e6"),
        ).where(F.col("s_1e6") > 0)
    return scores
