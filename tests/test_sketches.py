"""Sketch invariants the oracles can't express: HLL accuracy in its
design regime (the gate corpus sits in the small-range regime), exact
mergeability as algebra, bounded state, and CMS one-sidedness."""

import pytest
from pyspark.sql import functions as F

from hebrew_ner_spark.operators import sketches


@pytest.fixture(scope="module")
def docs(spark):
    from hebrew_ner_spark.sources.catalog import load_table

    return load_table(spark, "/root/testdata/sf0.001", "documents")


def _synth_items(spark, n, group="g"):
    """n distinct string items in one group."""
    return spark.range(n).select(
        F.lit(group).alias("grp"),
        F.concat(F.lit("item-"), F.col("id").cast("string")).alias("it"),
    )


def test_hll_accuracy_large_regime(spark):
    """Above the linear-counting threshold the raw estimator must land
    within the theoretical ~6.5% band (3 sigma ~= 20%, asserted at 15%)."""
    for n in (5_000, 20_000):
        est = (
            sketches.hll_estimate(
                sketches.hll_registers(_synth_items(spark, n), "grp", "it"), "grp"
            )
            .collect()[0]["est_distinct"]
        )
        assert abs(est / n - 1.0) < 0.15, (n, est)


def test_hll_accuracy_small_regime(spark):
    """Below 2.5*m the LUT linear-counting branch takes over; it is
    near-exact at tiny cardinalities."""
    for n in (10, 100, 400):
        row = (
            sketches.hll_estimate(
                sketches.hll_registers(_synth_items(spark, n), "grp", "it"), "grp"
            )
            .collect()[0]
        )
        assert row["v_zero"] > 0
        assert abs(row["est_distinct"] / n - 1.0) < 0.12, (n, row)


def test_hll_duplicates_do_not_move_registers(spark):
    """Cardinality estimation must ignore multiplicity: the register
    table of items U items equals that of items (max is idempotent)."""
    a = _synth_items(spark, 500)
    regs_once = sketches.hll_registers(a, "grp", "it")
    regs_dup = sketches.hll_registers(a.unionAll(a).unionAll(a), "grp", "it")
    assert regs_once.exceptAll(regs_dup).count() == 0
    assert regs_dup.exceptAll(regs_once).count() == 0


def test_hll_merge_equals_union_sketch(spark):
    """Merge algebra: max-merge of disjoint-shard sketches == sketch of
    the concatenated stream, register for register."""
    a, b = _synth_items(spark, 700), spark.range(700, 1600).select(
        F.lit("g").alias("grp"),
        F.concat(F.lit("item-"), F.col("id").cast("string")).alias("it"),
    )
    merged = sketches.hll_merge(
        sketches.hll_registers(a, "grp", "it"),
        sketches.hll_registers(b, "grp", "it"),
        "grp",
    )
    direct = sketches.hll_registers(a.unionAll(b), "grp", "it")
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_hll_state_is_bounded(spark):
    """The whole point at 100 TB: register rows per group <= m, no
    matter how many items went in."""
    regs = sketches.hll_registers(_synth_items(spark, 50_000), "grp", "it")
    assert regs.count() <= sketches.HLL_M


def test_hll_registers_partial_aggregation(spark):
    """The register build must partial-aggregate map-side (two
    HashAggregate phases around one exchange), or every token crosses
    the wire and the sketch saves nothing."""
    plan = sketches.hll_registers(
        _synth_items(spark, 1000), "grp", "it"
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange") == 1


def test_cms_one_sided_and_tight_for_heavy(docs):
    """est >= true for every candidate (structural), and for the top
    hitters of a small-vocab corpus the estimate should be exact or
    near-exact (collision mass is tiny relative to their counts)."""
    rows = sketches.token_heavy_hitters(docs, k=10).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["est_cnt"] >= r["true_cnt"], r
        assert r["est_cnt"] <= int(r["true_cnt"] * 1.5) + 50, r


def test_cms_grid_bounded(docs):
    grid = sketches.token_cms(docs)
    assert grid.count() <= sketches.CMS_D * sketches.CMS_W
    # every row index present
    assert grid.select("crow").distinct().count() == sketches.CMS_D


def test_cms_total_mass_per_row(docs):
    """Each CMS row is a partition of the stream: its counters sum to
    the total token count exactly."""
    n_items = sketches.doc_tokens(docs).count()
    sums = (
        sketches.token_cms(docs)
        .groupBy("crow")
        .agg(F.sum("cnt").alias("s"))
        .collect()
    )
    assert all(r["s"] == n_items for r in sums)


def test_cms_join_est_one_sided_and_exact_equal_sides(spark):
    """est >= true always; identical sides where every key is unique
    give true == n (and est >= n)."""
    from hebrew_ner_spark.operators import sketches as sk

    a = spark.createDataFrame([(f"k{i}",) for i in range(200)], "token string")
    r = sk.cms_join_size(a, a, "token").collect()[0]
    assert r.true_pairs == 200
    assert r.est_pairs >= r.true_pairs

    b = spark.createDataFrame([(f"other{i}",) for i in range(50)], "token string")
    r2 = sk.cms_join_size(a, b, "token").collect()[0]
    assert r2.true_pairs == 0
    assert r2.est_pairs >= 0


def test_cms_join_est_skewed_key_dominates(spark):
    """A single hot key contributes fa*fb pairs exactly — the estimator
    must carry it (CMS never undercounts the heavy cell)."""
    from hebrew_ner_spark.operators import sketches as sk

    a = spark.createDataFrame(
        [("hot",)] * 40 + [(f"a{i}",) for i in range(10)], "token string"
    )
    b = spark.createDataFrame(
        [("hot",)] * 30 + [(f"b{i}",) for i in range(10)], "token string"
    )
    r = sk.cms_join_size(a, b, "token").collect()[0]
    assert r.true_pairs == 1200
    assert r.est_pairs >= 1200


def test_ams_counters_match_python_and_merge_by_addition(spark):
    """AMS counters equal a pure-python replay, and shard sketches merge
    by addition (the mergeability contract)."""
    from hebrew_ner_spark.functions.hashing import phash_py
    from hebrew_ner_spark.operators.sketches import (
        AMS_K,
        AMS_SEED,
        ams_counters,
        ams_f2_estimate,
    )

    words = [f"w{j % 7}" for j in range(50)]   # skewed multiset
    items = spark.createDataFrame([(w,) for w in words], "token string")
    got = {r.i: r.x for r in ams_counters(items, "token").collect()}

    from collections import Counter
    cnt = Counter(words)
    for i in range(AMS_K):
        exp = sum(
            (1 - 2 * (phash_py(t, AMS_SEED + i) % 2)) * c
            for t, c in cnt.items()
        )
        assert got[i] == exp

    # merge: union of two shards == sum of their counters
    a = spark.createDataFrame([(w,) for w in words[:30]], "token string")
    b = spark.createDataFrame([(w,) for w in words[30:]], "token string")
    ca = {r.i: r.x for r in ams_counters(a, "token").collect()}
    cb = {r.i: r.x for r in ams_counters(b, "token").collect()}
    assert {i: ca[i] + cb[i] for i in ca} == got

    # the estimate is within 3x of exact F2 on this multiset (sanity;
    # the deterministic value is pinned by the oracle gate)
    r = ams_f2_estimate(items, "token").collect()[0]
    f2 = sum(c * c for c in cnt.values())
    assert r.f2_exact == f2
    assert 0 < r.f2_ams < 3 * f2
