"""Plan contracts: pushdown, pruning, and partition elimination.

These pin the three properties the 100 TB design depends on — a filter
that reaches the parquet scan, a projection that narrows ReadSchema,
and a partition predicate that eliminates directories — as executed-plan
assertions, so a refactor that silently breaks Catalyst's pushdown
(e.g. wrapping the filter column in a UDF) fails the suite instead of
quietly scanning the full corpus.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _uncached_scans(spark):
    # Other modules cache DataFrames over the same parquet paths; Spark's
    # cache manager then substitutes InMemoryRelation for any matching
    # sub-plan, which hides the FileScan (and its PushedFilters /
    # ReadSchema) these contracts assert on. Clear it — recomputation is
    # the only effect on the rest of the suite.
    spark.catalog.clearCache()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_predicate_pushdown_reaches_scan(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet").where(F.col("doc_id") > 400)
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "GreaterThan(doc_id,400)" in plan


def test_column_pruning_narrows_read_schema(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "lang")
    plan = _plan(df)
    # ReadSchema carries only the projected columns — the wide text
    # column must not be decoded at the scan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and "text" not in read_schema[0]
    assert "doc_id" in read_schema[0] and "lang" in read_schema[0]


def test_partition_pruning_eliminates_directories(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = str(tmp_path / "by_lang")
    docs.write.partitionBy("lang").parquet(out)

    pruned = spark.read.parquet(out).where(F.col("lang") == "he")
    plan = _plan(pruned)
    # FileScan renders all attributes on one line — slice the bracketed
    # segments out instead of matching whole lines
    part = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "lang" in part and "= he" in part
    # the lang predicate is resolved by directory elimination, never
    # pushed as a data filter
    assert "lang" not in pushed


def test_udf_wrapped_filter_defeats_pushdown_counterexample(spark):
    # the anti-pattern the contract protects against: a Python UDF in
    # the predicate keeps the filter OUT of the scan (PushedFilters
    # stays empty) — pinned so the cost of the pattern stays visible
    from pyspark.sql.types import BooleanType

    bad = F.udf(lambda x: x > 400, BooleanType())
    df = spark.read.parquet(f"{SF}/documents.parquet").where(bad(F.col("doc_id")))
    plan = _plan(df)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and "GreaterThan" not in pushed[0]


def test_interval_overlap_is_equi_join(spark):
    # the range join must compile to a hash/sort-merge EQUI-join on the
    # bin key, never a broadcast nested loop over the theta predicate
    from hebrew_ner_spark.queries import QUERIES

    plan = _plan(QUERIES["kg_interval_overlap"](spark, SF))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "Join [bin" in plan or "join [bin" in plan.lower()


def test_drift_heavy_uses_take_ordered(spark):
    # the global top-k over the vocabulary must be TakeOrdered (each
    # task forwards its local k), not a full sort through one task;
    # the rank window then runs over the k survivors only
    from hebrew_ner_spark.queries import QUERIES

    plan = _plan(QUERIES["txt_drift_heavy"](spark, SF))
    assert "TakeOrdered" in plan


def test_weighted_sample_uses_window_group_limit(spark):
    from hebrew_ner_spark.queries import QUERIES

    plan = _plan(QUERIES["cur_weighted_sample"](spark, SF))
    assert "WindowGroupLimit" in plan
