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
