"""Bloom-filter runtime pruning: semantics, non-vacuity, mergeability,
and the no-probe-shuffle plan contract (operators/bloomfilter.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hebrew_ner_spark.functions.hashing import phash_py
from hebrew_ner_spark.operators import bloomfilter as bf

SF = "/root/testdata/sf0.001"


def _terms(spark, words):
    return spark.createDataFrame([(w,) for w in words], "term string")


def test_no_false_negatives(spark):
    build = _terms(spark, [f"key{i}" for i in range(50)])
    probe = _terms(spark, [f"key{i}" for i in range(80)]).withColumnRenamed(
        "term", "token"
    )
    bits = bf.bloom_bits(build, "term", m=256)
    surv = {
        r.token for r in bf.bloom_prune(probe, "token", bits, m=256).collect()
    }
    # every true member survives — the invariant that makes the rewrite safe
    assert {f"key{i}" for i in range(50)} <= surv


def test_false_positives_exist_and_match_python_model(spark):
    """At m=64 the FP gate must be non-vacuous (ADVICE r2 pattern: a gate
    that never exercises its branch proves nothing), and the surviving
    set must equal an independent pure-python bloom model."""
    words = [f"w{i}" for i in range(30)]
    members = words[:12]
    build = _terms(spark, members)
    probe = _terms(spark, words).withColumnRenamed("term", "token")
    bits = bf.bloom_bits(build, "term", m=bf.FP_M)
    surv = {
        r.token
        for r in bf.bloom_prune(probe, "token", bits, m=bf.FP_M).collect()
    }

    bitset = {
        phash_py(w, bf.BLOOM_SEED + i) % bf.FP_M
        for w in members
        for i in range(bf.BLOOM_K)
    }
    model = {
        w for w in words
        if all(
            phash_py(w, bf.BLOOM_SEED + i) % bf.FP_M in bitset
            for i in range(bf.BLOOM_K)
        )
    }
    assert surv == model
    assert set(members) <= surv
    fps = surv - set(members)
    assert fps, "m=64 chosen to force false positives; none appeared"


def test_bitset_merge_is_union(spark):
    """Filter of a union == distinct-union of per-shard filters (the
    mergeability contract shards / micro-batches rely on)."""
    a = _terms(spark, [f"a{i}" for i in range(40)])
    b = _terms(spark, [f"b{i}" for i in range(40)])
    both = bf.bloom_bits(a.union(b), "term")
    merged = bf.bloom_bits(a, "term").union(bf.bloom_bits(b, "term")).distinct()
    assert {r.bit for r in both.collect()} == {r.bit for r in merged.collect()}


def test_prune_plan_has_no_probe_shuffle(spark):
    """The k semi-joins must all be broadcast — the probe side is pruned
    map-side, never shuffled. A plan regression to SortMergeJoin would
    silently reintroduce the full-probe shuffle at 100 TB."""
    spark.catalog.clearCache()
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    bits = bf.bloom_bits(orders, "o_orderkey")
    pruned = bf.bloom_prune(li, "l_orderkey", bits)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= bf.BLOOM_K
    assert "SortMergeJoin" not in plan
    # the only exchanges are broadcast (bits side) and the bits build's
    # own tiny distinct — the lineitem scan feeds the semi-joins directly
    for line in plan.splitlines():
        if "Exchange" in line and "Broadcast" not in line:
            assert "lineitem" not in line.lower()

    # and the pruning does real work at this selectivity
    n_probe = li.count()
    n_pruned = pruned.count()
    assert n_pruned < n_probe * 0.5
