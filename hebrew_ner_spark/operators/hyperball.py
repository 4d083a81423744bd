"""HyperBall: per-node ball-size sketches + the neighborhood function.

The reference pipeline has no graph-statistics axis (its unit of work is
one labeled request, ner_app.py:125-194); a Common-Crawl host graph
does, and the canonical way to measure it — average distance, effective
diameter, spid — is the NEIGHBORHOOD FUNCTION nf(t) = #pairs (v, w)
with dist(v, w) <= t. Exact all-pairs BFS is O(V·E) and undistributable
at 10^7 hosts; the published scalable algorithm is HyperBall
(Boldi & Vigna, "In-core computation of geometric centralities with
HyperBall", 2013 — the method behind the Facebook "four degrees of
separation" measurement): keep an O(1)-size HyperLogLog counter per
node, and fold

    b_t(v)  =  b_{t-1}(v)  max-merge  max-merge_{v->w} b_{t-1}(w)

so after t rounds b_t(v) sketches exactly the out-ball of radius t.
The whole state is |V| x 256 registers regardless of edge count or
radius, and one round is one edge join + one (node, register) max
aggregate — the same mergeable-by-max property that makes the HLL
family shard-safe (operators/sketches.py) makes it BFS-safe here.

Everything is the package's exact-integer HLL: the portable 60-bit md5
hash, bitlen rho, the ALPHA_1E6 raw estimator with the linear-counting
LUT — so a DuckDB oracle that computes TRUE distances with a recursive
CTE and then builds the same registers over the true balls must match
bit-for-bit (two opposite constructions of the same register tables).

Scale shape: per round, the register table shuffles once on the edge
key and once on (node, reg_idx); both tables are O(|V| * 256) rows —
at the 10^12-page tier the HOST graph is ~10^7 nodes, so ~2.5 G small
rows per round, far under one executor-fleet shuffle of the page
corpus. The radius is a fixed small constant (web effective diameter
is < 10 hops), so rounds are UNROLLED — no convergence action, one
linear plan. Register rows for unreached registers simply don't exist
(sparse representation), which the estimator's v_zero term accounts
for exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hebrew_ner_spark.operators.sketches import _hll_idx_rho, hll_estimate

HYPERBALL_RADIUS = 3


def hyperball_estimates(edges: DataFrame, radius: int = HYPERBALL_RADIUS) -> DataFrame:
    """(host, t, est_ball, v_zero) for t = 0..radius — the estimated
    out-ball size |{w : dist(host, w) <= t}| per node per radius,
    host itself included (t=0 balls are singletons).

    ``est_ball`` carries the full integer-HLL estimator semantics of
    ``sketches.hll_estimate`` (LUT linear counting in the small-range
    regime every real ball of a 10^7-host graph lives in until t is
    large); ``v_zero`` is the empty-register count, pinning the sketch
    state itself through the estimate.
    """
    nodes = (
        edges.select(F.col("src").alias("host"))
        .union(edges.select(F.col("dst")))
        .distinct()
    )
    idx, rho = _hll_idx_rho(F.col("host"))
    regs = nodes.select("host", idx, rho.alias("reg_max"))
    e = edges.select("src", "dst").distinct()

    def estimate(r: DataFrame, t: int) -> DataFrame:
        return hll_estimate(r, "host").select(
            "host",
            F.lit(t).cast("long").alias("t"),
            F.col("est_distinct").alias("est_ball"),
            "v_zero",
        )

    out = estimate(regs, 0)
    for t in range(1, radius + 1):
        via = (
            e.join(regs, e["dst"] == regs["host"])
            .select(F.col("src").alias("host"), "reg_idx", "reg_max")
        )
        regs = (
            regs.unionByName(via)
            .groupBy("host", "reg_idx")
            .agg(F.max("reg_max").alias("reg_max"))
        )
        out = out.unionByName(estimate(regs, t))
    return out


def neighborhood_function(
    edges: DataFrame, radius: int = HYPERBALL_RADIUS
) -> DataFrame:
    """(t, nf, ge90) — the estimated neighborhood function nf(t) =
    sum over hosts of the radius-t ball estimate, plus the effective-
    diameter indicator ge90 (BIGINT 0/1): whether nf(t) has reached
    90% of nf(radius). The smallest t with ge90 = 1 is the (interpolation-
    free, integer) effective diameter at this horizon — the headline
    scalar of the Boldi-Vigna / four-degrees measurements.

    One sum aggregate over the per-node estimates plus one broadcast of
    the single nf(radius) row; 10*nf >= 9*nf_max keeps the 90% test in
    exact integers on both engines.
    """
    per_t = (
        hyperball_estimates(edges, radius)
        .groupBy("t")
        .agg(F.sum("est_ball").cast("long").alias("nf"))
    )
    nf_max = per_t.where(F.col("t") == radius).select(
        F.col("nf").alias("_nf_max")
    )
    return per_t.crossJoin(F.broadcast(nf_max)).select(
        "t",
        "nf",
        F.when(F.col("nf") * 10 >= F.col("_nf_max") * 9, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("ge90"),
    )


def harmonic_centrality(
    edges: DataFrame, radius: int = HYPERBALL_RADIUS
) -> DataFrame:
    """(host, harmonic_1e6) — HyperBall harmonic centrality (Boldi &
    Vigna's headline application, "Axioms for centrality" 2014):
    H(v) = sum over t >= 1 of (|B(v,t)| - |B(v,t-1)|) / t, i.e. every
    reachable node contributes 1/dist. Rewards nodes close to
    everything, is finite under disconnection (unlike closeness), and
    at bounded radius prices exactly the web's four-degrees regime.

    Each per-distance shell term is rounded half-up to micro-units
    before summing (deterministic on both engines; error <= 5e-7 per
    shell, radius shells total). The shell delta is clamped at 0: the
    HLL estimate is non-decreasing in the registers, but the
    linear-counting/LUT switchover can dip an estimate by a count or
    two between consecutive t — a negative shell is estimator noise,
    not a real negative shell. One keyed window over (host) with
    radius+1 rows per partition — bounded by construction — then a
    host-keyed rollup; the expensive part remains the shared ball
    folding in hyperball_estimates.
    """
    from pyspark.sql import Window

    est = hyperball_estimates(edges, radius)
    w = Window.partitionBy("host").orderBy("t")
    shells = est.withColumn(
        "_prev", F.lag("est_ball").over(w)
    ).where(F.col("t") >= 1)
    return (
        shells.select(
            "host",
            F.expr(
                "(2 * greatest(est_ball - _prev, 0L) * 1000000 + t)"
                " DIV (2 * t)"
            ).alias("_term"),
        )
        .groupBy("host")
        .agg(F.sum("_term").cast("long").alias("harmonic_1e6"))
    )
