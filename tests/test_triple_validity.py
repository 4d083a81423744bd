"""Temporal triple scoping (operators/kg.py triple_validity): planted
snapshots with appearing/disappearing facts, multi-page evidence, and
distinct-sighting semantics."""

from __future__ import annotations

import datetime as dt

from hebrew_ner_spark.operators.kg import triple_validity

T0 = dt.datetime(2024, 1, 1)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")


def _ms(d):
    return int((T0 + dt.timedelta(days=d)).timestamp() * 1000)


def test_validity_intervals_and_counts(spark):
    # 'data join table' lives in snapshots 0-2 of page a and snapshot 1 of
    # page b; 'key merge row' only in snapshot 0 of a; 'row scan key' only
    # in snapshot 2 of b.
    rows = [
        ("a", T0, "data join table and key merge row"),
        ("a", T0 + dt.timedelta(days=1), "data join table"),
        ("a", T0 + dt.timedelta(days=2), "data join table"),
        ("b", T0 + dt.timedelta(days=1), "data join table"),
        ("b", T0 + dt.timedelta(days=2), "row scan key"),
    ]
    got = {
        (r.subj, r.pred, r.obj): (r.first_ms, r.last_ms, r.n_sightings, r.n_pages)
        for r in triple_validity(_pages(spark, rows)).collect()
    }
    assert got == {
        ("data", "join", "table"): (_ms(0), _ms(2), 4, 2),
        ("key", "merge", "row"): (_ms(0), _ms(0), 1, 1),
        ("row", "scan", "key"): (_ms(2), _ms(2), 1, 1),
    }


def test_repeated_triple_in_one_snapshot_counts_once(spark):
    rows = [("a", T0, "data join table data join table")]
    [r] = triple_validity(_pages(spark, rows)).collect()
    assert (r.subj, r.pred, r.obj) == ("data", "join", "table")
    assert r.n_sightings == 1 and r.n_pages == 1
