

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
