"""Distributed stable matching (Gale-Shapley 1962, synchronous
McVitie-Wilson-style proposal rounds): assignment under TWO-SIDED
preferences — crawl shards to fetcher pools, partitions to executors
with locality preferences, reviewer/task routing — where one-sided
greedy (HRW sharding, operators/crawl.py) cannot guarantee the
no-blocking-pair property that makes an assignment renegotiation-free.

Deterministic synchronous rounds over hash-derived preference orders:

* preference tables are built ONCE from the portable hash —
  proposer p ranks acceptors by phash(p|a) (row_number, tie on id),
  acceptors rank proposers symmetrically with an independent seed;
* each round, EVERY free proposer proposes to the next acceptor on
  its list (one join on (p, ptr)); each proposed-to acceptor keeps
  the best of {new proposers} u {current tenant} under ITS rank (one
  groupBy-min via row_number); every loser — including a displaced
  tenant — advances its pointer.

Classic theory gives termination with a perfect, PROPOSER-OPTIMAL
stable matching (same result as sequential GS — the deferred-
acceptance outcome is order-independent), in at most n^2 proposals
total; the synchronous schedule reaches it in ~n rounds in practice
(15 on the 16x16 gate instance). The fixed round budget is a no-op
past completion (no free proposers -> empty round) and the final
check RAISES if anyone is still free.

Shape at scale: state is one row per proposer (pointer) + one per
acceptor (tenant); a round is three keyed equi-joins + one rank
window partitioned by acceptor. Preference lists at web scale are
TOP-T truncated (each side scores only plausible partners — the
standard market-design practice), which bounds the grid to n*T rows.

Cites Gale & Shapley (AMM 1962), McVitie & Wilson (BIT 1971).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

GS_N = 16
GS_SEED_P, GS_SEED_A = 311, 733
GS_ROUNDS = 24


def _grid(spark, n: int) -> DataFrame:
    return (
        spark.range(n)
        .select(F.col("id").alias("p"))
        .crossJoin(spark.range(n).select(F.col("id").alias("a")))
    )


def preference_tables(spark, n: int = GS_N):
    """(ppref (p, idx, a), arank (a, p, rk)) — hash-derived total
    preference orders for both sides, portable to the oracle."""
    from hebrew_ner_spark.functions.hashing import phash_col

    g = _grid(spark, n)
    key = F.concat_ws("|", F.col("p"), F.col("a"))
    ppref = g.select(
        "p",
        "a",
        (
            F.row_number().over(
                Window.partitionBy("p").orderBy(
                    phash_col(key, GS_SEED_P).asc(), F.col("a").asc()
                )
            )
            - 1
        ).cast("long").alias("idx"),
    )
    arank = g.select(
        "a",
        "p",
        F.row_number().over(
            Window.partitionBy("a").orderBy(
                phash_col(key, GS_SEED_A).asc(), F.col("p").asc()
            )
        ).cast("long").alias("rk"),
    )
    return ppref, arank


def stable_matching(
    spark, n: int = GS_N, rounds: int = GS_ROUNDS
) -> DataFrame:
    """(acceptor, proposer, a_rank, p_idx) — the proposer-optimal
    stable matching with each side's rank of its partner."""
    from hebrew_ner_spark.operators.canonicalize import _lineage_breaker
    from hebrew_ner_spark.operators.graphstats import _evict, _persist

    _evict("stable_matching")
    ppref, arank = preference_tables(spark, n)
    brk = _lineage_breaker(ppref, None)
    ppref = _persist("stable_matching", ppref)
    arank = _persist("stable_matching", arank)

    ptr = brk(
        spark.range(n).select(
            F.col("id").alias("p"), F.lit(0).cast("long").alias("ptr")
        )
    )
    match = brk(
        spark.createDataFrame([], "a long, p long")
    )
    for _ in range(rounds):
        free = (
            ptr.join(match.select("p"), "p", "left_anti")
            .where(F.col("ptr") < n)
        )
        # early exit: an empty free set makes every later round a
        # no-op (the oracle's extra unrolled rounds are identity), so
        # the one count probe here buys skipping their checkpoints
        if free.limit(1).count() == 0:
            break
        props = free.join(
            ppref.withColumnRenamed("idx", "ptr"), ["p", "ptr"]
        ).select("a", "p")
        tenants = match.join(props.select("a").distinct(), "a")
        cands = props.unionByName(tenants).distinct()
        ranked = cands.join(arank, ["a", "p"]).withColumn(
            "is_best",
            F.row_number().over(
                Window.partitionBy("a").orderBy(F.asc("rk"), F.asc("p"))
            )
            == 1,
        )
        best = ranked.where("is_best").select("a", "p")
        losers = ranked.where(~F.col("is_best")).select("p")
        ptr = brk(
            ptr.join(losers.withColumn("_l", F.lit(1)), "p", "left")
            .select(
                "p",
                (F.col("ptr") + F.when(F.col("_l").isNotNull(), 1).otherwise(0))
                .cast("long")
                .alias("ptr"),
            )
        )
        match = brk(
            match.join(best.select("a"), "a", "left_anti").unionByName(best)
        )
    n_matched = match.count()
    if n_matched != n:
        raise RuntimeError(
            f"stable_matching: {n_matched}/{n} matched after {rounds} "
            "rounds — raise the budget"
        )
    return (
        match.join(arank, ["a", "p"])
        .join(ppref, ["p", "a"])
        .select(
            F.col("a").alias("acceptor"),
            F.col("p").alias("proposer"),
            F.col("rk").alias("a_rank"),
            F.col("idx").alias("p_idx"),
        )
    )
