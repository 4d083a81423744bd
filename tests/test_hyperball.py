"""HyperBall tests: register-fold correctness vs exact per-node balls."""

from hebrew_ner_spark.operators import hyperball, scc
from hebrew_ner_spark.operators.sketches import _hll_idx_rho

from pyspark.sql import functions as F


def rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(s, d) for s, d in pairs], "src string, dst string"
    )


def exact_est(spark, members):
    """The estimator applied to an EXACT member set — what the fold must
    reproduce when it has truly seen exactly that ball."""
    df = spark.createDataFrame([(m,) for m in members], "host string")
    idx, rho = _hll_idx_rho(F.col("host"))
    from hebrew_ner_spark.operators.sketches import hll_estimate

    regs = (
        df.select(F.lit("k").alias("k"), idx, rho.alias("reg_max"))
        .groupBy("k", "reg_idx")
        .agg(F.max("reg_max").alias("reg_max"))
    )
    return hll_estimate(regs, "k").collect()[0]["est_distinct"]


def test_hyperball_chain_balls(spark):
    # a -> b -> c -> d: out-ball of a grows by one per radius.
    e = edges_df(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    got = dict(
        ((r[0], r[1]), r[2])
        for r in rows(hyperball.hyperball_estimates(e), "host", "t", "est_ball")
    )
    assert got[("a", 0)] == exact_est(spark, ["a"])
    assert got[("a", 1)] == exact_est(spark, ["a", "b"])
    assert got[("a", 2)] == exact_est(spark, ["a", "b", "c"])
    assert got[("a", 3)] == exact_est(spark, ["a", "b", "c", "d"])
    # sink's ball never grows
    for t in range(4):
        assert got[("d", t)] == exact_est(spark, ["d"])
    # singleton estimates are exactly 1 in the LC regime
    assert got[("a", 0)] == 1


def test_hyperball_cycle_saturates(spark):
    # 3-cycle: every ball is the whole cycle from t=2 on and stays fixed.
    e = edges_df(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    got = dict(
        ((r[0], r[1]), r[2])
        for r in rows(hyperball.hyperball_estimates(e), "host", "t", "est_ball")
    )
    full = exact_est(spark, ["a", "b", "c"])
    for h in "abc":
        assert got[(h, 2)] == full
        assert got[(h, 3)] == full


def test_neighborhood_fn_monotone_and_ge90(spark):
    docs = spark.range(0, 70).withColumnRenamed("id", "doc_id")
    nf = rows(
        hyperball.neighborhood_function(scc.synth_host_edges(docs)),
        "t", "nf", "ge90",
    )
    vals = [v for _, v, _ in nf]
    assert vals == sorted(vals)          # nf(t) is monotone in t
    assert nf[-1][2] == 1                 # the horizon always reaches 90%
    flags = [g for _, _, g in nf]
    assert flags == sorted(flags)         # ge90 is monotone too
