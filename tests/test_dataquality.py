"""Data-quality suite: constructed-fixture rule counts, corruption
precedence, clean-table all-pass, non-vacuous planted counts."""

from pyspark.sql import functions as F

from hebrew_ner_spark.operators import dataquality as dq


def _report(spark, orders_rows, cust_keys):
    orders = spark.createDataFrame(
        orders_rows,
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderstatus string",
    )
    customer = spark.createDataFrame(
        [(k,) for k in cust_keys], "c_custkey long"
    )
    return {
        r.rule: (r.n_violations, r.n_rows, r.ok)
        for r in dq.orders_quality_report(orders, customer).collect()
    }


class TestRuleCounts:
    def test_each_rule_counts_exactly(self, spark):
        rows = [
            (1, 10, 5.0, "F"),     # clean
            (1, 10, 5.0, "F"),     # duplicate key (both occurrences count)
            (2, None, 5.0, "O"),   # null custkey
            (3, 999, 5.0, "P"),    # orphan fk
            (4, 10, -1.0, "F"),    # non-positive total
            (5, 10, 0.0, "F"),     # boundary: zero is a violation
            (6, 10, 5.0, "Z"),     # bad status
        ]
        got = _report(spark, rows, [10])
        assert got["unique"] == (2, 7, 0)
        assert got["not_null"] == (1, 7, 0)
        assert got["fk_customer"] == (1, 7, 0)
        assert got["range_positive"] == (2, 7, 0)
        assert got["in_set"] == (1, 7, 0)

    def test_null_is_not_an_fk_orphan(self, spark):
        rows = [(1, None, 5.0, "F")]
        got = _report(spark, rows, [10])
        assert got["fk_customer"][0] == 0 and got["not_null"][0] == 1

    def test_all_pass_on_clean_rows(self, spark):
        rows = [(i, 10, 5.0, "F") for i in range(5)]
        got = _report(spark, rows, [10])
        assert all(v == (0, 5, 1) for v in got.values())


class TestPlantedCorruption:
    def test_every_rule_fires_on_the_twin(self, spark, sf_dir):
        from hebrew_ner_spark.sources.catalog import load_table

        orders = load_table(spark, sf_dir, "orders")
        customer = load_table(spark, sf_dir, "customer")
        rep = {
            r.rule: r.n_violations
            for r in dq.orders_quality_report(
                dq.corrupt_orders(orders), customer
            ).collect()
        }
        assert all(v > 0 for v in rep.values()), rep
        clean = {
            r.rule: r.ok
            for r in dq.orders_quality_report(orders, customer).collect()
        }
        assert all(v == 1 for v in clean.values())


def test_benford_audit_closed_form(spark):
    """Constructed amounts with known first digits: counts, half-up
    shares and the pinned Benford constants (which sum to exactly 1e6)
    must all match."""
    from hebrew_ner_spark.operators.dataquality import BENFORD_1E6, benford_audit

    assert sum(BENFORD_1E6.values()) == 1_000_000
    amounts = [1.23, 19.99, 100.0, 2.5, 25.0, 3.0, 0.0, -5.0]
    # cents: 123, 1999, 10000, 250, 2500, 300 -> digits 1,1,1,2,2,3
    df = spark.createDataFrame([(a,) for a in amounts], "amt double")
    out = {r.digit: r for r in benford_audit(df, "amt").collect()}
    assert {d: out[d].n for d in out} == {1: 3, 2: 2, 3: 1}
    assert out[1].share_1e6 == 500_000
    assert out[2].share_1e6 == (2 * 2 * 1_000_000 + 6) // 12
    assert out[1].benford_1e6 == 301_030
    assert out[1].dev_1e6 == 500_000 - 301_030


class TestAnonymity:
    def _classes(self, spark, rows):
        cust = spark.createDataFrame(
            rows, "c_custkey long, c_nationkey int, c_mktsegment string, c_acctbal double"
        )
        return dq.k_anonymity_classes(cust)

    def test_class_sizes_and_diversity(self, spark):
        # class A: 5 members, 3 distinct balances -> safe on both axes
        # class B: 2 members, 1 distinct balance  -> risky on both axes
        rows = [
            (1, 1, "AUTO", 100.0), (2, 1, "AUTO", 100.0), (3, 1, "AUTO", 200.0),
            (4, 1, "AUTO", 300.0), (5, 1, "AUTO", 300.0),
            (6, 2, "SHIP", 50.0), (7, 2, "SHIP", 50.0),
        ]
        got = {
            (r.c_nationkey, r.c_mktsegment): r
            for r in self._classes(spark, rows).collect()
        }
        a = got[(1, "AUTO")]
        assert (a.class_size, a.l_distinct, a.k_risky, a.l_risky) == (5, 3, 0, 0)
        b = got[(2, "SHIP")]
        assert (b.class_size, b.l_distinct, b.k_risky, b.l_risky) == (2, 1, 1, 1)

    def test_negative_balance_bands_floor(self, spark):
        # floor(-0.5) = -1 band, distinct from the 0 band: a truncating
        # division would merge them and hide a small class
        rows = [(1, 1, "AUTO", -500.0), (2, 1, "AUTO", 500.0)]
        bands = {r.bal_band for r in self._classes(spark, rows).collect()}
        assert bands == {-1, 0}

    def test_summary_counts_records_at_risk(self, spark):
        rows = [
            (1, 1, "AUTO", 100.0), (2, 1, "AUTO", 100.0),  # size-2 class
            (3, 2, "SHIP", 50.0),                          # size-1 class
        ]
        s = dq.anonymity_summary(self._classes(spark, rows)).collect()[0]
        assert (s.n_classes, s.k_risky_classes, s.records_at_risk) == (2, 2, 3)
        assert s.min_class_size == 1


def test_iqr_outliers_closed_form(spark):
    # 11 dollar values 0..9 plus one planted 1000: q1 = 3rd smallest
    # (4*cum >= 11) = 2, q3 = 9th smallest (4*cum >= 33) = 8, iqr 6
    # -> high fence v > 8 + 9 = 17: only 1000 flags; low fence
    # v < 2 - 9: nothing
    vals = list(range(10)) + [1000]
    orders = spark.createDataFrame(
        [(i, "P", float(v)) for i, v in enumerate(vals)],
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    )
    out = dq.iqr_outliers(orders).collect()[0]
    assert (out.q1, out.q3, out.iqr) == (2, 8, 6)
    assert (out.n_low, out.n_high, out.n_rows) == (0, 1, 11)


def test_iqr_fence_boundary_is_strict(spark):
    # iqr=4 -> high fence strictly above q3 + 6; v = q3 + 6 exactly on
    # the fence must NOT flag (2*(v-q3) == 3*iqr, not >)
    vals = [0, 1, 2, 3, 4, 10]  # q1=1, q3=4, iqr=3 -> fence at 4+4.5
    orders = spark.createDataFrame(
        [(i, "P", float(v)) for i, v in enumerate(vals)],
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    )
    out = dq.iqr_outliers(orders).collect()[0]
    assert (out.q1, out.q3) == (1, 4)
    assert out.n_high == 1  # only 10 (> 8.5); the fence itself excluded


def test_dp_release_mechanism(spark):
    """Seeded discrete-Laplace release: python bit-parity, exact
    geometric marginals over many keys, zero-centered empirical mean."""
    import hashlib

    from hebrew_ner_spark.operators.dataquality import (
        DP_SEED_A,
        DP_SEED_B,
        dp_count_release,
    )

    def phash(s, seed):
        return int(hashlib.md5(f"{s}:{seed}".encode()).hexdigest()[:15], 16)

    def geo(h):
        return ((h ^ (h + 1)).bit_length()) - 1

    rows = [(i % 200, i) for i in range(2000)]
    df = spark.createDataFrame(rows, ["grp", "x"])
    out = {
        r.grp: r
        for r in dp_count_release(df, "grp", (DP_SEED_A, DP_SEED_B)).collect()
    }
    assert len(out) == 200
    for g, r in out.items():
        want = geo(phash(g, DP_SEED_A)) - geo(phash(g, DP_SEED_B))
        assert r.noise == want
        assert r.released == r.true_count + r.noise
        assert r.true_count == 10
    # empirical: noise is symmetric-ish and small (geometric mean 1)
    noises = [r.noise for r in out.values()]
    assert abs(sum(noises)) < 100
    assert any(n > 0 for n in noises) and any(n < 0 for n in noises)
    # geometric(1/2) marginal: ~half the G draws are 0
    gs = [geo(phash(g, DP_SEED_A)) for g in range(200)]
    assert 60 < sum(1 for g in gs if g == 0) < 140


def test_ks_two_sample_parity_and_decisions(spark):
    from hebrew_ner_spark.operators import dataquality

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    rows = {
        r.pair: r
        for r in dataquality.ks_two_sample(
            dataquality.orders_drift_samples(orders)
        ).collect()
    }
    # brute-force replay of the planted pair
    import collections

    vals = [(o.o_orderkey, o.o_totalprice) for o in orders.collect()]
    s1 = sorted(round(p * 100) for k, p in vals if k % 2 == 0)
    s2 = sorted(round(p * 105) for k, p in vals if k % 2 == 1)
    n1, n2 = len(s1), len(s2)
    cnt1, cnt2 = collections.Counter(s1), collections.Counter(s2)
    cum1 = cum2 = 0
    d = 0
    for v in sorted(set(s1) | set(s2)):
        cum1 += cnt1.get(v, 0)
        cum2 += cnt2.get(v, 0)
        d = max(d, abs(cum1 * n2 - cum2 * n1))
    p = rows["planted_drift"]
    assert (p.n1, p.n2, p.d_num, p.d_den) == (n1, n2, d, n1 * n2)
    # decision parity with the closed-form large-sample rule (at this
    # tiny sf the planted pair may legitimately accept; sf0.01 rejects
    # — the gate corpus — so only parity is asserted here)
    want_reject = int(
        float(d) * d * 1e6
        > dataquality.KS_ALPHA_C2_1E6 * float(n1 + n2) * n1 * n2
    )
    assert p.reject_05 == want_reject
    assert rows["parity_null"].reject_05 == 0
    # the null pair's D is far under the planted pair's
    assert rows["parity_null"].ks_1e6 < p.ks_1e6
