

def test_event_count_anomalies_closed_form(spark):
    import datetime as dt

    from hebrew_ner_spark.operators import relational

    # type A: counts 5,5,5,50 across 4 hours -> med 5, MAD 0, the burst
    # hour flags (MAD=0 flags ANY deviation); type B: 1,2,9 -> med 2,
    # devs {1,0,7} -> MAD 1, only 9 flags (7 > 3).
    rows_ = []
    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    def add(t, h, n):
        for i in range(n):
            rows_.append((t, base + dt.timedelta(hours=h, minutes=i % 50), 1.0))
    for h, n in enumerate([5, 5, 5, 50]):
        add("A", h, n)
    for h, n in enumerate([1, 2, 9]):
        add("B", h, n)
    events = spark.createDataFrame(
        rows_, "event_type string, ts timestamp, value double"
    )
    got = {
        (r["event_type"], r["n_events"]): (r["med"], r["mad"], r["anomaly"])
        for r in relational.event_count_anomalies(events).collect()
    }
    assert got[("A", 5)] == (5, 0, 0)
    assert got[("A", 50)] == (5, 0, 1)
    assert got[("B", 1)] == (2, 1, 0)
    assert got[("B", 2)] == (2, 1, 0)
    assert got[("B", 9)] == (2, 1, 1)


def test_bitmap_index_packing_and_popcount(spark):
    """Constructed keys spanning word boundaries (incl. bit 31): packed
    words match hand-computed ORs and popcount counting equals the base
    count."""
    from hebrew_ner_spark.operators.relational import (
        bitmap_status_counts,
        orders_status_bitmap,
    )

    keys = [0, 1, 31, 32, 63, 64, 95]
    rows = [(k, "F" if k % 2 == 0 else "O") for k in keys]
    df = spark.createDataFrame(rows, "o_orderkey long, o_orderstatus string")
    words = {(r.o_orderstatus, r.word_id): r.bits
             for r in orders_status_bitmap(df).collect()}
    exp = {}
    for k, st in rows:
        w, b = k // 32, k % 32
        exp[(st, w)] = exp.get((st, w), 0) | (1 << b)
    assert words == exp
    counts = {r.o_orderstatus: r.n_orders
              for r in bitmap_status_counts(orders_status_bitmap(df)).collect()}
    assert counts == {"F": 3, "O": 4}


def _events(spark, rows):
    """rows: (event_id, user_id, minute_offset, event_type)."""
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (eid, base + timedelta(minutes=m), u, t, 0.0, "{}")
            for eid, u, m, t in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_event_transitions_closed_form(spark):
    from hebrew_ner_spark.operators.relational import event_transitions

    ev = _events(spark, [
        (1, 1, 0, "view"), (2, 1, 5, "click"), (3, 1, 10, "view"),
        (4, 1, 100, "purchase"),          # gap > 30 min: no transition
        (5, 2, 0, "view"), (6, 2, 1, "click"), (7, 2, 3, "purchase"),
    ])
    got = {
        (r.from_type, r.to_type): (r.n, r.prob_1e6)
        for r in event_transitions(ev).collect()
    }
    # view->click twice (all view exits), click splits 50/50 between
    # view and purchase; the cross-gap pair is absent
    assert got[("view", "click")] == (2, 1_000_000)
    assert got[("click", "view")] == (1, 500_000)
    assert got[("click", "purchase")] == (1, 500_000)
    assert ("view", "purchase") not in got
    assert sum(n for n, _ in got.values()) == 4


def test_event_transitions_ts_tie_breaks_by_event_id(spark):
    from hebrew_ner_spark.operators.relational import event_transitions

    ev = _events(spark, [
        (10, 1, 0, "a"), (11, 1, 0, "b"), (12, 1, 0, "c"),
    ])
    got = {(r.from_type, r.to_type) for r in event_transitions(ev).collect()}
    assert got == {("a", "b"), ("b", "c")}


class TestTheilSen:
    def test_exact_linear_series(self, spark):
        from hebrew_ner_spark.operators.relational import theil_sen_trend

        # counts 2,4,6,8 per hour -> every pairwise slope is exactly 2
        rows, eid = [], 0
        for h, c in enumerate([2, 4, 6, 8]):
            for _ in range(c):
                eid += 1
                rows.append((eid, 1, h * 60, "view"))
        out = theil_sen_trend(_events(spark, rows)).collect()[0]
        assert (out.n_hours, out.n_pairs, out.slope_1e6) == (4, 6, 2_000_000)

    def test_burst_resistance_and_negative_slope(self, spark):
        from hebrew_ner_spark.operators.relational import theil_sen_trend

        # declining series 5,4,3,2 with one burst hour (100): the
        # median slope stays negative; OLS would report a large
        # positive slope from the single burst
        counts = [5, 4, 3, 100, 2]
        rows, eid = [], 0
        for h, c in enumerate(counts):
            for _ in range(c):
                eid += 1
                rows.append((eid, 1, h * 60, "view"))
        out = theil_sen_trend(_events(spark, rows)).collect()[0]
        assert out.slope_1e6 < 0

    def test_half_away_from_zero_on_negative_median(self, spark):
        from hebrew_ner_spark.operators.relational import theil_sen_trend

        # two hours, counts 3 -> 0 over 2 hours: slope -3/2 = -1.5
        # rounds away from zero to -1500000 ... use dx=2 by skipping an
        # hour so the rational is non-integer
        rows = [(1, 1, 0, "view"), (2, 1, 1, "view"), (3, 1, 2, "view"),
                (4, 1, 120, "view")]
        # hours: h0 count 3, h2 count 1 -> single pair slope -1.0
        out = theil_sen_trend(_events(spark, rows)).collect()[0]
        assert out.slope_1e6 == -1_000_000


def test_session_paths_truncation_and_breaks(spark):
    from hebrew_ner_spark.operators.relational import session_paths

    ev = _events(spark, [
        # session 1: 7 events -> path truncated to first 5
        (1, 1, 0, "a"), (2, 1, 1, "b"), (3, 1, 2, "c"),
        (4, 1, 3, "d"), (5, 1, 4, "e"), (6, 1, 5, "f"), (7, 1, 6, "g"),
        # >30 min idle -> new session
        (8, 1, 60, "a"), (9, 1, 61, "b"),
        # user 2 repeats the short path
        (10, 2, 0, "a"), (11, 2, 1, "b"),
    ])
    got = {(r.path, r.n_sessions, r.rank) for r in session_paths(ev).collect()}
    assert got == {("a>b", 2, 1), ("a>b>c>d>e", 1, 2)}


def test_type_hour_association_uniform_is_exact(spark):
    from hebrew_ner_spark.operators.relational import type_hour_association

    # 2 types x 2 hours, perfectly independent: delta must be 0
    rows, eid = [], 0
    for h in (0, 1):
        for t, c in (("a", 2), ("b", 4)):
            for _ in range(c):
                eid += 1
                rows.append((eid, 1, h * 60, t))
    out = type_hour_association(_events(spark, rows)).collect()
    assert all(r.delta_micro == 0 for r in out)
    by = {(r.event_type, r.hod): r for r in out}
    assert by[("a", 0)].exp_micro == 2_000_000  # 4*6*1e6 // 12


def test_type_hour_association_detects_affinity(spark):
    from hebrew_ner_spark.operators.relational import type_hour_association

    # type a only in hour 0, type b only in hour 1: maximal deviation
    rows = [(1, 1, 0, "a"), (2, 1, 70, "b")]
    out = {(r.event_type, r.hod): r for r in
           type_hour_association(_events(spark, rows)).collect()}
    a = out[("a", 0)]
    assert a.n == 1 and a.exp_micro == 500_000 and a.delta_micro == 500_000
