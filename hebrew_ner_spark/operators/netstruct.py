"""Degree-structure diagnostics: assortativity sufficient statistics +
the rich-club coefficient, in exact integers.

Why this is engine work: two standard one-look diagnostics of a crawl
or entity graph's health. Degree ASSORTATIVITY (Newman 2002) says
whether hubs link to hubs (social-ish, r > 0) or to leaves (web-ish,
r < 0) — a drifting r across crawl snapshots flags template or spam
topology changes. The RICH-CLUB coefficient (Zhou & Mondragón 2004)
phi(k) = 2 E_{>k} / (N_{>k} (N_{>k} - 1)) measures how densely the
top-degree vertices interlink — a link farm IS a rich club (the
planted gate graph's clique maxes phi at the high-k tail, which the
gate pins).

Exactness contract:

* ``assortativity_moments`` emits the SUFFICIENT STATISTICS as one
  BIGINT row — ends m = 2|E|, S_x = sum of end degrees, S_xx, and
  S_xy over symmetrized edge ends — plus the Pearson numerator
  ``m * S_xy - S_x^2`` and denominator ``m * S_xx - S_x^2`` (equal
  marginals under symmetrization make both sqrt factors collapse to
  the same integer, so r = num/den EXACTLY, no square root). The
  division itself stays out of the gate: the numerator is negative
  for disassortative graphs, where Spark's DIV (toward zero) and
  DuckDB's // (floor) disagree — emitting the exact integer pair
  sidesteps the only nonportable operation.
* ``rich_club`` works from DEGREE HISTOGRAMS, not per-vertex scans:
  N_{>k} is a suffix sum of the degree histogram, E_{>k} a suffix
  sum of the edge min-end-degree histogram — both tables are
  degree-grain (tiny even on a 10^12-edge graph), so the k-sweep is
  a self-join of two small aggregates, never a per-k pass over the
  data. phi is non-negative, so truncating micro-unit division is
  portable here.

No reference counterpart; cites Newman (PRL 2002) and Zhou &
Mondragón (IEEE Comm. Lett. 2004) for the measures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hebrew_ner_spark.operators.centrality import sym_edges

RC_SCALE = 1_000_000


def _end_degrees(und: DataFrame) -> DataFrame:
    """(src, dst, ds, dd) — symmetrized edges with both end degrees."""
    sym = sym_edges(und)
    deg = sym.groupBy(F.col("src").alias("v")).agg(
        F.count("*").cast("long").alias("deg")
    )
    return (
        sym.join(deg.withColumnRenamed("v", "src").withColumnRenamed("deg", "ds"), "src")
        .join(deg.withColumnRenamed("v", "dst").withColumnRenamed("deg", "dd"), "dst")
    )


def assortativity_moments(und: DataFrame) -> DataFrame:
    """One row (m, s_x, s_xx, s_xy, num, den) — the exact Pearson
    pieces of degree assortativity over symmetrized edge ends."""
    e = _end_degrees(und)
    agg = e.agg(
        F.count("*").cast("long").alias("m"),
        F.sum("ds").cast("long").alias("s_x"),
        F.sum(F.expr("ds * ds")).cast("long").alias("s_xx"),
        F.sum(F.expr("ds * dd")).cast("long").alias("s_xy"),
    )
    return agg.select(
        "m",
        "s_x",
        "s_xx",
        "s_xy",
        (F.col("m") * F.col("s_xy") - F.col("s_x") * F.col("s_x"))
        .cast("long")
        .alias("num"),
        (F.col("m") * F.col("s_xx") - F.col("s_x") * F.col("s_x"))
        .cast("long")
        .alias("den"),
    )


def rich_club(und: DataFrame) -> DataFrame:
    """(k, n_gt, e_gt, phi_scaled) for every degree threshold k from 0
    to degmax - 1 with at least two qualifying vertices — suffix sums
    over the degree and edge-min-degree histograms."""
    e = _end_degrees(und)
    deg_hist = (
        e.groupBy(F.col("src").alias("v"))
        .agg(F.first("ds").alias("deg"))
        .groupBy("deg")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    # each undirected edge appears twice in sym; halve via src < dst
    edge_hist = (
        e.where(F.col("src") < F.col("dst"))
        .select(F.least("ds", "dd").alias("mindeg"))
        .groupBy("mindeg")
        .agg(F.count("*").cast("long").alias("ecnt"))
    )
    ks = deg_hist.select(
        F.explode(F.expr("sequence(0, deg - 1)")).alias("k")
    ).distinct()
    n_gt = (
        ks.join(deg_hist, deg_hist.deg > ks.k)
        .groupBy("k")
        .agg(F.sum("cnt").cast("long").alias("n_gt"))
    )
    e_gt = (
        ks.join(edge_hist, edge_hist.mindeg > ks.k)
        .groupBy("k")
        .agg(F.sum("ecnt").cast("long").alias("e_gt"))
    )
    return (
        n_gt.join(e_gt, "k", "left")
        .where(F.col("n_gt") > 1)
        .select(
            "k",
            "n_gt",
            F.coalesce("e_gt", F.lit(0)).cast("long").alias("e_gt"),
            F.expr(
                f"(2 * coalesce(e_gt, 0) * {RC_SCALE}) DIV (n_gt * (n_gt - 1))"
            )
            .cast("long")
            .alias("phi_scaled"),
        )
    )


def modularity_pieces(wund: DataFrame, labels: DataFrame) -> DataFrame:
    """(community, n_v, w_in, s_tot, q_num, q_den) — weighted Newman
    modularity of a given partition, in exact integer pieces:

        Q = sum_c [ w_in_c / W  -  (s_c / 2W)^2 ]
        Q * 4W^2 = sum_c [ 4 W w_in_c - s_c^2 ]   (all BIGINT)

    ``wund`` is the undirected weighted edge list (a, b, n), ``labels``
    the partition (entity, community). Per-community q_num can be
    negative (a community sparser than its degree share), which is
    exactly why the gate emits integer pieces instead of dividing —
    negative truncating division is the one nonportable op (the
    assortativity_moments precedent). Q itself = sum(q_num) / q_den,
    computed exactly by the consumer.

    Shape: one strength aggregate (vertex-grain), one both-ends-in-
    community join over the edge list (entity-keyed equi-joins), one
    community-grain aggregate, W folded back by broadcast-of-aggregate.
    Community count is the output grain — tiny at any corpus scale."""
    sym = wund.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "n"
    ).unionAll(
        wund.select(F.col("b").alias("src"), F.col("a").alias("dst"), "n")
    )
    strength = sym.groupBy(F.col("src").alias("entity")).agg(
        F.sum("n").cast("long").alias("s")
    )
    la = labels.select(F.col("entity").alias("a"), F.col("community").alias("ca"))
    lb = labels.select(F.col("entity").alias("b"), F.col("community").alias("cb"))
    w_in = (
        wund.join(la, "a")
        .join(lb, "b")
        .where(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.sum("n").cast("long").alias("w_in"))
    )
    s_c = (
        labels.join(strength, "entity")
        .groupBy("community")
        .agg(
            F.count("*").cast("long").alias("n_v"),
            F.sum("s").cast("long").alias("s_tot"),
        )
    )
    tot = wund.agg(F.sum("n").cast("long").alias("w"))
    return (
        s_c.join(w_in, "community", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "community",
            "n_v",
            F.coalesce("w_in", F.lit(0)).cast("long").alias("w_in"),
            "s_tot",
            (
                F.lit(4) * F.col("w") * F.coalesce("w_in", F.lit(0))
                - F.col("s_tot") * F.col("s_tot")
            ).cast("long").alias("q_num"),
            (F.lit(4) * F.col("w") * F.col("w")).cast("long").alias("q_den"),
        )
    )
