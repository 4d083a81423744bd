

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
