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


# ---------------------------------------------------------------------------
# Per-file Bloom skipping (point-lookup file pruning)
# ---------------------------------------------------------------------------


def _pages(spark, n=200):
    """Tiny write-order-clustered layout: FILE_CHUNK urls per file."""
    return spark.range(n).select(
        F.concat(F.lit("https://t/doc/"), F.col("id").cast("string")).alias("url"),
        (F.col("id") / bf.FILE_CHUNK).cast("long").alias("file_id"),
    )


def test_file_bloom_no_false_negatives_and_fps_exist(spark):
    """Every file that truly contains a lookup key must be scanned
    (structural Bloom guarantee), and at the gate's m the decision set
    must contain false positives so the skip path is non-vacuous."""
    pages = _pages(spark)
    blooms = bf.file_blooms(pages)
    keys = spark.range(0, 200, 7).select(
        F.concat(F.lit("https://t/doc/"), F.col("id").cast("string")).alias("k")
    ).union(
        spark.range(0, 200, 7).select(
            F.concat(F.lit("https://t/absent/"), F.col("id").cast("string"))
        )
    )
    scan = {
        (r.k, r.file_id)
        for r in bf.bloom_point_lookup(blooms, keys, m=64).collect()
    }
    # rebuild the decision set against a pure-python model at the same m
    blob = {}
    for i in range(200):
        fid = i // bf.FILE_CHUNK
        for s in range(bf.BLOOM_K):
            blob.setdefault(fid, set()).add(
                phash_py(f"https://t/doc/{i}", bf.FILE_BLOOM_SEED + s) % 64
            )
    model = set()
    for r in keys.collect():
        kb = {
            phash_py(r.k, bf.FILE_BLOOM_SEED + s) % 64
            for s in range(bf.BLOOM_K)
        }
        for fid, bits in blob.items():
            if kb <= bits:
                model.add((r.k, fid))
    # note: bloom_point_lookup at m=64 must rebuild blooms at m=64 too
    scan64 = {
        (r.k, r.file_id)
        for r in bf.bloom_point_lookup(
            bf.file_blooms(pages, m=64), keys, m=64
        ).collect()
    }
    assert scan64 == model
    truth = {
        (f"https://t/doc/{i}", i // bf.FILE_CHUNK) for i in range(0, 200, 7)
    }
    assert truth <= scan64, "false negative: a file holding the key was skipped"
    assert scan64 - truth, "m=64 chosen to force false positives; none appeared"


def test_file_bloom_blob_bounded_and_plan_broadcast_only(spark):
    """Blob table is <= m rows per file, and the lookup join broadcasts
    only the tiny key side — the manifest plane itself never shuffles
    through a SortMergeJoin."""
    pages = _pages(spark, 300)
    blooms = bf.file_blooms(pages)
    per_file = blooms.groupBy("file_id").count().collect()
    assert all(r["count"] <= bf.FILE_BLOOM_M for r in per_file)

    keys = spark.range(0, 300, 11).select(
        F.concat(F.lit("https://t/doc/"), F.col("id").cast("string")).alias("k")
    )
    plan = (
        bf.bloom_point_lookup(blooms, keys)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
