"""Plan-shape assertions for the end-of-round operators: the shuffle
counts and join strategies their PLANS.md entries claim are pinned here
so a regression surfaces as a test failure, not a slow cluster job."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scd2_single_shuffle(spark):
    from datetime import datetime

    from hebrew_ner_spark.operators.maintenance import scd2_collapse

    hist = spark.createDataFrame(
        [("u", datetime(2024, 1, d), "t") for d in (1, 2, 3)],
        "url string, warc_ts timestamp, text string",
    )
    plan = _plan(scd2_collapse(hist))
    # both windows + the change filter share one hash partitioning on
    # the natural key: exactly one exchange added by the whole collapse
    assert plan.count("Exchange") == 1
    assert "CartesianProduct" not in plan


def test_k_anonymity_is_one_aggregate(spark):
    from hebrew_ner_spark.operators.dataquality import k_anonymity_classes

    cust = spark.read.parquet(f"{SF}/customer.parquet")
    plan = _plan(k_anonymity_classes(cust))
    # count(DISTINCT sensitive) makes this a two-phase aggregate: one
    # exchange on (QI, cents) then one on the QI alone — and no more
    assert plan.count("Exchange") == 2
    assert "HashAggregate" in plan
    assert "CartesianProduct" not in plan


def test_selectivity_estimator_broadcasts_predicates(spark):
    from hebrew_ner_spark.operators.maintenance import selectivity_report

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    plan = _plan(selectivity_report(orders))
    # the 4-row predicate table must never shuffle the FACT scan: the
    # actual-count leg joins orders x predicates via a broadcast
    # nested-loop (range condition), so the word appears in the plan;
    # the est-vs-actual join runs over two 4-row aggregates and its
    # strategy is irrelevant
    assert "BroadcastNestedLoopJoin" in plan


def test_session_paths_no_cartesian(spark):
    from hebrew_ner_spark.operators.relational import session_paths

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = _plan(session_paths(ev))
    assert "CartesianProduct" not in plan


def test_theil_sen_pairs_join_is_keyed(spark):
    from hebrew_ner_spark.operators.relational import theil_sen_trend

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = _plan(theil_sen_trend(ev))
    # the pair self-join keys on event_type (hourly-aggregate grain);
    # a cross join here would be quadratic in the raw row count
    assert "CartesianProduct" not in plan
