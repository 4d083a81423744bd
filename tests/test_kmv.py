"""KMV bottom-k sketches: pruning losslessness, mergeability, estimates."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hebrew_ner_spark.functions.hashing import phash_py
from hebrew_ner_spark.operators import sketches


def _items(spark, rows):
    return spark.createDataFrame(rows, "grp string, tok string")


def test_sketch_equals_naive_window(spark):
    """The bucket-prefix pruning must reproduce the naive rank-everything
    construction exactly (losslessness of the two-level shortcut)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = sketches.doc_tokens(docs)
    fast = sketches.kmv_sketch(toks, "lang", "token")
    naive = (
        toks.select(
            "lang",
            F.expr(
                "CAST(conv(substr(md5(concat(token, ':', '77')), 1, 15), 16, 10) AS BIGINT)"
            ).alias("hv"),
        )
        .distinct()
        .withColumn(
            "r",
            F.row_number()
            .over(Window.partitionBy("lang").orderBy("hv"))
            .cast("long"),
        )
        .where(F.col("r") <= sketches.KMV_K)
        .select("lang", "r", "hv")
    )
    assert fast.exceptAll(naive).count() == 0
    assert naive.exceptAll(fast).count() == 0


def test_estimate_exact_below_k(spark):
    """A set smaller than k is carried whole: est == true count."""
    rows = [("g", f"t{i}") for i in range(20)]
    sk = sketches.kmv_sketch(_items(spark, rows), "grp", "tok", k=64)
    est = sketches.kmv_estimate(sk, "grp", k=64).collect()[0]
    assert est.n_sk == 20 and est.est_distinct == 20


def test_estimate_reasonable_above_k(spark):
    """With 2000 distinct items and k=64 the estimator should land
    within a factor-of-2 band (binomial tail at this k is far tighter)."""
    rows = [("g", f"token-{i}") for i in range(2000)]
    sk = sketches.kmv_sketch(_items(spark, rows), "grp", "tok", k=64)
    est = sketches.kmv_estimate(sk, "grp", k=64).collect()[0].est_distinct
    assert 1000 <= est <= 4000


def test_jaccard_extremes(spark):
    """Identical strata -> 1e6; disjoint strata -> 0."""
    rows = (
        [("a", f"s{i}") for i in range(300)]
        + [("b", f"s{i}") for i in range(300)]       # b == a
        + [("c", f"other{i}") for i in range(300)]   # c disjoint
    )
    sk = sketches.kmv_sketch(_items(spark, rows), "grp", "tok", k=64)
    j = {
        (r.key_a, r.key_b): r.jaccard_1e6
        for r in sketches.kmv_pair_jaccard(sk, "grp", k=64).collect()
    }
    assert j[("a", "b")] == 1_000_000
    assert j[("a", "c")] == 0
    assert j[("b", "c")] == 0


def test_half_overlap_estimate(spark):
    """Two strata sharing half their items: estimate near J = 1/3."""
    rows = [("a", f"x{i}") for i in range(400)] + [
        ("b", f"x{i}") for i in range(200, 600)
    ]
    sk = sketches.kmv_sketch(_items(spark, rows), "grp", "tok", k=128)
    r = sketches.kmv_pair_jaccard(sk, "grp", k=128).collect()[0]
    assert 200_000 <= r.jaccard_1e6 <= 470_000
    assert r.n_eval == 128


def test_portable_hash_parity():
    """The Spark-side hv column and phash_py agree (single source of
    truth for the sketch contents)."""
    assert phash_py("abc", 77) == int(
        __import__("hashlib").md5(b"abc:77").hexdigest()[:15], 16
    )


def test_priority_sample_dlt_properties(spark):
    """DLT structure: python parity, certainties carry exact weight,
    estimator total tracks the true total within the k-sample error."""
    import hashlib

    from hebrew_ner_spark.operators.sketches import (
        PS_K,
        PS_M,
        PS_SEED,
        priority_sample,
    )

    rows = [(i, (i * 37) % 90 + 10) for i in range(100)]
    # one mega-weight item: must be a certainty (w >= tau -> est == w)
    rows.append((999, 100_000))
    df = spark.createDataFrame(rows, ["item", "w"])
    out = {r.item: r for r in priority_sample(df).collect()}

    def phash(s, seed):
        return int(hashlib.md5(f"{s}:{seed}".encode()).hexdigest()[:15], 16)

    pr = {
        i: (w * PS_M) // (phash(i, PS_SEED) % PS_M + 1) for i, w in rows
    }
    order = sorted(pr, key=lambda i: (-pr[i], i))
    sample, tau = set(order[:PS_K]), pr[order[PS_K]]
    assert {i for i, r in out.items() if r.in_sample} == sample
    for i, r in out.items():
        assert r.prio == pr[i]
        assert r.est == (max(dict(rows)[i], tau) if i in sample else 0)
    # the mega item is sampled and estimates itself exactly
    assert out[999].in_sample == 1 and out[999].est == 100_000
    # unbiasedness sanity: estimator total within 60% of truth on this
    # single draw (variance bound ~ W^2/(k-1); the mega certainty
    # carries most of the mass exactly)
    truth = sum(w for _, w in rows)
    est = sum(r.est for r in out.values())
    assert abs(est - truth) < 0.6 * truth


def test_priority_sample_small_universe(spark):
    """n <= k regression (ADVICE r4): no (k+1)-th priority exists, so
    tau must be 0 and every item an in-sample certainty (est = w) —
    not an empty result from a vanished tau row."""
    from hebrew_ner_spark.operators.sketches import PS_K, priority_sample

    rows = [(i, 10 * (i + 1)) for i in range(PS_K - 2)]
    df = spark.createDataFrame(rows, ["item", "w"])
    out = {r.item: r for r in priority_sample(df).collect()}
    assert len(out) == len(rows)
    for i, w in rows:
        assert out[i].in_sample == 1 and out[i].est == w
