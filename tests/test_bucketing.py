"""Bucketed-table co-located join: the write-time layout that removes
the join shuffle entirely — the engine-level demonstration behind the
Iceberg bucket-transform contract the sinks document (sources/catalog).

A fact-fact join at 10^12 rows shuffles BOTH sides on the key unless
the tables were written bucketed by that key with aligned bucket
counts; then each task sort-merge-joins its bucket pair locally and the
plan carries NO Exchange. This is the claim; the test reads the plan.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_pair(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_customer")
    (
        orders.write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .option("path", str(tmp_path / "bkt_orders"))
        .saveAsTable("bkt_orders")
    )
    (
        customer.write.bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .option("path", str(tmp_path / "bkt_customer"))
        .saveAsTable("bkt_customer")
    )
    yield orders, customer
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_customer")


def test_bucketed_join_is_exchange_free(spark, bucketed_pair):
    orders, customer = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bo = spark.table("bkt_orders")
        bc = spark.table("bkt_customer")
        j = bo.join(bc, bo.o_custkey == bc.c_custkey).groupBy("c_nationkey").agg(
            F.count("*").alias("n"),
            F.expr(
                "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)"
            ).alias("cents"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        # the join itself runs on bucket-aligned scans: SMJ, and the ONLY
        # exchange in the whole plan is the groupBy's (bucketed scans
        # need no shuffle and no extra sort beyond the bucket sort files)
        assert "SortMergeJoin" in plan
        pre_agg = plan.split("HashAggregate")[-1]  # below the partial agg
        assert "Exchange" not in pre_agg
        # cross-check the result against the plain (shuffled) join
        want = {
            (r.c_nationkey, r.n, r.cents)
            for r in orders.join(
                customer, orders.o_custkey == customer.c_custkey
            )
            .groupBy("c_nationkey")
            .agg(
                F.count("*").alias("n"),
                F.expr(
                    "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)"
                ).alias("cents"),
            )
            .collect()
        }
        got = {(r.c_nationkey, r.n, r.cents) for r in j.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_join_shuffles_both_sides(spark, sf_dir):
    """The control: the same join off plain parquet carries exchanges on
    both inputs — the cost bucketing deletes."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
        j = orders.join(customer, orders.o_custkey == customer.c_custkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
