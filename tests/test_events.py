"""Event analytics: conversion funnel, cohort retention, JSON props."""

from __future__ import annotations



class TestEventFunnel:
    def test_strict_temporal_order(self, spark):
        import datetime as dt

        from hebrew_ner_spark.operators.relational import event_funnel

        t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
        rows = [
            # user 1 converts fully in order
            (1, t(1), 1, "view"), (2, t(2), 1, "click"), (3, t(3), 1, "purchase"),
            # user 2 clicks BEFORE viewing -> counts at view only
            (4, t(5), 2, "click"), (5, t(6), 2, "view"),
            # user 3 views only
            (6, t(7), 3, "view"),
        ]
        events = spark.createDataFrame(
            [(i, ts, u, et, 0.0, "{}") for i, ts, u, et in rows],
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        got = {r.step: r for r in event_funnel(events).collect()}
        assert got["view"].n_users == 3
        assert got["click"].n_users == 1  # only user 1 clicked after viewing
        assert got["purchase"].n_users == 1
        assert got["view"].conv_from_prev_1e6 == 1000000
        assert got["click"].conv_from_prev_1e6 == 333333
        assert got["purchase"].conv_from_first_1e6 == 333333


class TestCohortRetention:
    def test_offsets_and_counts(self, spark):
        import datetime as dt

        from hebrew_ner_spark.operators.relational import cohort_retention

        d = lambda day, u: (day * 10 + u, dt.datetime(2024, 1, 1 + day, 12), u, "view", 0.0, "{}")
        events = spark.createDataFrame(
            [d(0, 1), d(0, 2), d(1, 1), d(2, 1), d(1, 3)],
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        got = {(r.cohort_day - 19723, r.offset_days): r.n_users
               for r in cohort_retention(events).collect()}
        # day-0 cohort: users 1,2 at offset 0; user 1 at offsets 1 and 2
        assert got[(0, 0)] == 2 and got[(0, 1)] == 1 and got[(0, 2)] == 1
        # day-1 cohort: user 3
        assert got[(1, 0)] == 1


class TestJsonProps:
    def test_extract_and_null_handling(self, spark):
        import datetime as dt

        from hebrew_ner_spark.operators.relational import json_prop_stats

        events = spark.createDataFrame(
            [
                (1, dt.datetime(2024, 1, 1), 1, "view", 0.0, '{"k": 10}'),
                (2, dt.datetime(2024, 1, 1), 2, "view", 0.0, '{"x": 1}'),
                (3, dt.datetime(2024, 1, 1), 3, "click", 0.0, '{"k": 7}'),
            ],
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        got = {r.event_type: r for r in json_prop_stats(events).collect()}
        assert (got["view"].n_events, got["view"].n_with_k, got["view"].sum_k) == (2, 1, 10)
        assert (got["click"].sum_k, got["click"].max_k) == (7, 7)


def test_cusum_prefix_identity_matches_recursion(spark):
    """The windowed prefix-sum/running-min form must equal Page's
    sequential recursion replayed in python, and only the planted type
    may alarm."""
    from hebrew_ner_spark.operators import relational

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rows = relational.cusum_alarms(events).collect()
    # rebuild the series in python
    import collections

    evs = [(r.event_type, r.ts) for r in events.select("event_type", "ts").collect()]
    h0 = min(ts.replace(minute=0, second=0, microsecond=0) for _, ts in evs)
    counts = collections.Counter(
        (et, int((ts.replace(minute=0, second=0, microsecond=0) - h0).total_seconds()) // 3600)
        for et, ts in evs
    )
    types = {et for et, _ in evs}
    want = []
    for et in types:
        xs = [
            counts.get((et, t), 0)
            * (2 if et == "click" and t >= relational.CUSUM_REF_HOURS else 1)
            for t in range(relational.CUSUM_GRID_HOURS)
        ]
        mu = sum(xs[: relational.CUSUM_REF_HOURS]) * 1000 // relational.CUSUM_REF_HOURS
        k = mu // relational.CUSUM_K_DEN
        s = 0
        for t, x in enumerate(xs):
            s = max(0, s + x * 1000 - mu - k)
            if s > relational.CUSUM_H_MUL * mu:
                want.append((et, t, x, s, mu))
    assert sorted((r.event_type, r.t, r.x, r.s_1e3, r.mu_1e3) for r in rows) == sorted(want)


def test_cusum_detection_contract_at_gate_scale(spark):
    """At the gate corpus (sf0.01, ~2.8 events/hour/type) the planted
    type is the ONLY alarming series and detection lags the shift by
    hours, not days. (sf0.001 is too sparse for a false-alarm-free
    threshold — a single 2-event hour crosses 4*mu there.)"""
    from hebrew_ner_spark.operators import relational

    events = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    rows = relational.cusum_alarms(events).collect()
    assert {r.event_type for r in rows} == {"click"}
    first = min(r.t for r in rows)
    assert relational.CUSUM_REF_HOURS < first <= relational.CUSUM_REF_HOURS + 24
