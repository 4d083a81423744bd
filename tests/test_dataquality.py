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
