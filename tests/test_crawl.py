"""Crawl-versioning + as-of join semantics on planted histories."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hebrew_ner_spark.operators import crawl


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")


def _probes(spark, rows):
    return spark.createDataFrame(rows, "url string, probe_ts timestamp")


class TestAsofJoin:
    def test_picks_latest_at_or_before(self, spark):
        ev = _events(
            spark,
            [
                ("u", _ts("2024-01-01T00:00:00"), "v0"),
                ("u", _ts("2024-01-03T00:00:00"), "v1"),
                ("u", _ts("2024-01-05T00:00:00"), "v2"),
            ],
        )
        pr = _probes(spark, [("u", _ts("2024-01-04T12:00:00"))])
        [r] = crawl.asof_join(pr, ev, key="url").collect()
        assert r.text == "v1" and r.warc_ts == _ts("2024-01-03T00:00:00")

    def test_equal_timestamp_matches(self, spark):
        # <= semantics: a probe exactly at an event's timestamp takes it.
        ev = _events(spark, [("u", _ts("2024-01-03T00:00:00"), "v1")])
        pr = _probes(spark, [("u", _ts("2024-01-03T00:00:00"))])
        [r] = crawl.asof_join(pr, ev, key="url").collect()
        assert r.text == "v1"

    def test_probe_before_first_event_gets_nulls(self, spark):
        ev = _events(spark, [("u", _ts("2024-01-03T00:00:00"), "v1")])
        pr = _probes(spark, [("u", _ts("2024-01-02T00:00:00"))])
        [r] = crawl.asof_join(pr, ev, key="url").collect()
        assert r.text is None and r.warc_ts is None

    def test_keys_do_not_leak(self, spark):
        # an event on another key must never satisfy a probe
        ev = _events(spark, [("a", _ts("2024-01-01T00:00:00"), "va")])
        pr = _probes(spark, [("b", _ts("2024-01-02T00:00:00"))])
        [r] = crawl.asof_join(pr, ev, key="url").collect()
        assert r.text is None

    def test_no_row_amplification(self, spark):
        # N probes in, exactly N rows out regardless of event count.
        ev = _events(
            spark,
            [("u", _ts(f"2024-01-0{d}T00:00:00"), f"v{d}") for d in range(1, 8)],
        )
        pr = _probes(
            spark, [("u", _ts(f"2024-01-0{d}T12:00:00")) for d in range(1, 8)]
        )
        out = crawl.asof_join(pr, ev, key="url")
        assert out.count() == 7


class TestCrawlHistory:
    def test_latest_crawl_picks_newest(self, spark):
        docs = spark.createDataFrame(
            [(0, "key join table", "he"), (1, "row merge part", "en")],
            "doc_id long, text string, lang string",
        )
        hist = crawl.synth_crawl_history(docs)
        assert hist.count() == 2 * crawl.CRAWL_VERSIONS
        latest = crawl.latest_crawl(hist)
        rows = {r.url: r.text for r in latest.collect()}
        # doc 0 (even): v2 edits again; doc 1 (odd): v2 == v1
        assert rows["https://example.org/he/doc/0"].endswith("dup dup")
        assert rows["https://example.org/en/doc/1"].endswith("dup")

    def test_deltas_flag_first_and_changes_only(self, spark):
        docs = spark.createDataFrame(
            [(0, "key join table", "he"), (1, "row merge part", "en")],
            "doc_id long, text string, lang string",
        )
        d = crawl.crawl_deltas(crawl.synth_crawl_history(docs))
        flags = {(r.url.rsplit("/", 1)[1], r.v): r.changed for r in d.collect()}
        assert flags[("0", 0)] and flags[("0", 1)] and flags[("0", 2)]
        assert flags[("1", 0)] and flags[("1", 1)] and not flags[("1", 2)]


class TestAsofJoinContract:
    def test_probe_columns_preserved(self, spark):
        ev = _events(spark, [("u", _ts("2024-01-01T00:00:00"), "v0")])
        pr = spark.createDataFrame(
            [("u", _ts("2024-01-02T00:00:00"), 7), ("u", _ts("2024-01-02T00:00:00"), 8)],
            "url string, probe_ts timestamp, probe_id long",
        )
        rows = sorted(
            (r.probe_id, r.text) for r in crawl.asof_join(pr, ev, key="url").collect()
        )
        # two probes sharing (url, ts) stay attributable via probe_id
        assert rows == [(7, "v0"), (8, "v0")]

    def test_empty_payload_means_timestamp_only(self, spark):
        ev = _events(spark, [("u", _ts("2024-01-01T00:00:00"), "v0")])
        pr = _probes(spark, [("u", _ts("2024-01-02T00:00:00"))])
        out = crawl.asof_join(pr, ev, key="url", payload=[])
        assert "text" not in out.columns and "warc_ts" in out.columns


def test_sitemap_roundtrip_and_order(spark):
    docs = spark.createDataFrame(
        [(0,), (20,), (40,), (1,)], "doc_id long"
    )
    xmls = {r["host"]: r["xml"] for r in crawl.synth_sitemaps(docs).collect()}
    # one sitemap per host, entries in doc_id order
    assert set(xmls) == {"h0.example.org", "h1.example.org"}
    x0 = xmls["h0.example.org"]
    assert x0.index("/p/0<") < x0.index("/p/20<") < x0.index("/p/40<")
    got = sorted(
        tuple(r)
        for r in crawl.sitemap_urls(crawl.synth_sitemaps(docs)).collect()
    )
    assert ("h0.example.org", "https://h0.example.org/p/20", 21) in got
    assert len(got) == 4


def test_recrawl_policy(spark):
    docs = spark.createDataFrame([(13,), (2,), (10,)], "doc_id long")
    got = {
        r["url"].rsplit("/", 1)[-1]: (r["last_fetch_day"], r["fetch"])
        for r in crawl.recrawl_decisions(
            crawl.sitemap_urls(crawl.synth_sitemaps(docs))
        ).collect()
    }
    assert got["13"] == (None, 1)          # never fetched -> fetch
    # doc 2: lastmod 3, last_fetch 1 + 6 = 7 -> up to date
    assert got["2"] == (7, 0)
    # doc 10: lastmod 11, last_fetch 1 + 30 % 28 = 3 -> stale -> fetch
    assert got["10"] == (3, 1)
