"""Crawl-versioning operators over the (url, warc_ts, …) page table.

A real Common-Crawl corpus has MANY snapshots of the same url across
crawls; the reference pipeline (single-file corpora, ner_app.py) never
faces this, but at the north rule's 10^12-page scale the version axis is
where dedup/incrementality lives. Three operators:

* ``latest_crawl``   — newest snapshot per url (``max_by`` aggregate: one
  shuffle on url, no window sort, no join-back);
* ``crawl_deltas``   — per-url change flags between consecutive crawls
  (lag window over (url, warc_ts) — one shuffle, linear);
* ``asof_join``      — generic "most recent event at or before each
  probe" join. Spark has no ASOF JOIN; the classic equi-range rewrite
  explodes. This is the union-trick implementation: tag probes and
  events, union them, and carry event payloads forward with
  ``last(ignorenulls)`` over an (key, ts)-sorted window — ONE shuffle,
  zero row amplification, exactly the merge an ASOF join does natively.
  (DuckDB ships a native ASOF JOIN, which the gate uses as the oracle.)

Synthetic history (``synth_crawl_history``) is deterministic and closed
form so oracles can reconstruct every version from ``documents``:
version v of a page re-crawls it ``v`` days later; v1 always edits the
page (appends filler), v2 edits it again only for even doc_ids — giving
both changed and unchanged consecutive pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hebrew_ner_spark.operators.extract import synth_webpages

CRAWL_VERSIONS = 3


def synth_crawl_history(docs: DataFrame) -> DataFrame:
    """(url, warc_ts, text, lang, v) — CRAWL_VERSIONS snapshots per url."""
    # url already encodes doc_id; recover it cheaply instead of re-joining.
    pages = synth_webpages(docs).withColumn(
        "doc_id", F.element_at(F.split("url", "/"), -1).cast("long")
    )
    v = F.explode(F.sequence(F.lit(0), F.lit(CRAWL_VERSIONS - 1))).alias("v")
    hist = pages.select("url", "warc_ts", "text", "lang", "doc_id", v)
    return hist.select(
        "url",
        (F.col("warc_ts") + F.expr("make_interval(0, 0, 0, v, 0, 0, 0)")).alias("warc_ts"),
        F.when(F.col("v") == 0, F.col("text"))
        .when(F.col("v") == 1, F.concat("text", F.lit(" dup")))
        .otherwise(
            F.when(
                F.col("doc_id") % 2 == 0, F.concat("text", F.lit(" dup dup"))
            ).otherwise(F.concat("text", F.lit(" dup")))
        )
        .alias("text"),
        "lang",
        F.col("v").cast("long").alias("v"),
    )


def latest_crawl(pages: DataFrame) -> DataFrame:
    """(url, warc_ts, text) — the newest snapshot of every url.

    ``max_by`` keeps the whole row through one partial-aggregating
    shuffle; the window-rank alternative sorts every group and the
    self-join alternative reads the table twice.
    """
    return pages.groupBy("url").agg(
        F.max("warc_ts").alias("warc_ts"),
        F.expr("max_by(text, warc_ts)").alias("text"),
    )


def crawl_deltas(pages: DataFrame) -> DataFrame:
    """(url, warc_ts, v, changed) — did each crawl change the page?

    The first crawl of a url counts as changed (it introduced the page).
    """
    w = Window.partitionBy("url").orderBy("warc_ts")
    return pages.select(
        "url",
        "warc_ts",
        "v",
        (
            F.lag("text").over(w).isNull()
            | (F.col("text") != F.lag("text").over(w))
        ).alias("changed"),
    )


def asof_join(
    probes: DataFrame,
    events: DataFrame,
    key: str,
    probe_ts: str = "probe_ts",
    event_ts: str = "warc_ts",
    payload: list[str] | None = None,
) -> DataFrame:
    """Left as-of join: each probe row — with ALL its columns — gains the
    payload of the latest event with ``event_ts <= probe_ts`` on the same
    key (NULLs if none).

    Union trick: events sort before probes at equal timestamps (the
    ``<=`` semantic), and ``last(ignorenulls)`` carries the most recent
    event payload forward within each key partition. One shuffle on
    ``key``; no range-join explosion; probes with no prior event keep
    NULL payloads. ``payload=[]`` means "timestamp only" (the sentinel is
    None, not falsiness).
    """
    if payload is None:
        payload = [c for c in events.columns if c not in (key, event_ts)]
    extra = [c for c in probes.columns if c not in (key, probe_ts)]
    ev = events.select(
        F.col(key),
        F.col(event_ts).alias("_ts"),
        F.lit(0).alias("_is_probe"),
        F.lit(None).cast("timestamp").alias(probe_ts),
        *[F.lit(None).cast(probes.schema[c].dataType).alias(c) for c in extra],
        F.col(event_ts).alias("_ev_ts"),
        *[F.col(c).alias(f"_ev_{c}") for c in payload],
    )
    pr = probes.select(
        F.col(key),
        F.col(probe_ts).alias("_ts"),
        F.lit(1).alias("_is_probe"),
        F.col(probe_ts),
        *[F.col(c) for c in extra],
        F.lit(None).cast("timestamp").alias("_ev_ts"),
        *[F.lit(None).cast(events.schema[c].dataType).alias(f"_ev_{c}") for c in payload],
    )
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_is_probe")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = ev.unionByName(pr).select(
        key,
        "_is_probe",
        probe_ts,
        *extra,
        F.last("_ev_ts", ignorenulls=True).over(w).alias(event_ts),
        *[
            F.last(f"_ev_{c}", ignorenulls=True).over(w).alias(c)
            for c in payload
        ],
    )
    return carried.where(F.col("_is_probe") == 1).drop("_is_probe")
