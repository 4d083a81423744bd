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


# ---------------------------------------------------------------------------
# Sitemap ingestion + recrawl scheduling
# ---------------------------------------------------------------------------

SITEMAP_HOSTS = 20


def synth_sitemaps(docs: DataFrame) -> DataFrame:
    """(host, xml) — one sitemap-protocol XML document per host,
    deterministic: every document contributes a ``<url>`` entry
    (loc = https://h{doc_id%20}.example.org/p/{doc_id},
    lastmod day = 1 + doc_id % 28) to its host's sitemap, entries in
    doc_id order. The synthesis->parse round trip is the gated claim
    (the jsonld/infobox/webtable class): oracles replay the closed
    form, Spark must recover it from the XML it built.
    """
    entry = F.concat(
        F.lit("<url><loc>https://h"),
        (F.col("doc_id") % SITEMAP_HOSTS).cast("string"),
        F.lit(".example.org/p/"),
        F.col("doc_id").cast("string"),
        F.lit("</loc><lastmod>2026-08-"),
        F.lpad((1 + F.col("doc_id") % 28).cast("string"), 2, "0"),
        F.lit("</lastmod></url>"),
    )
    per_host = docs.select(
        F.concat(
            F.lit("h"), (F.col("doc_id") % SITEMAP_HOSTS).cast("string"),
            F.lit(".example.org"),
        ).alias("host"),
        F.struct(F.col("doc_id").alias("d"), entry.alias("e")).alias("_ent"),
    )
    return per_host.groupBy("host").agg(
        F.concat(
            F.lit('<?xml version="1.0"?><urlset>'),
            F.array_join(F.transform(F.array_sort(F.collect_list("_ent")), lambda s: s["e"]), ""),
            F.lit("</urlset>"),
        ).alias("xml")
    )


def sitemap_urls(sitemaps: DataFrame) -> DataFrame:
    """(host, url, lastmod_day) — the parsed sitemap entries.

    Pure JVM-side parse: two aligned ``regexp_extract_all`` arrays
    (sitemap entries carry exactly one loc and one lastmod each, per
    the protocol) zipped positionally and exploded — zero UDFs, zero
    shuffles beyond the upstream build; at production scale sitemaps
    arrive one-XML-per-fetch and this is a flatMap-shaped projection.
    The day is parsed back to an integer so downstream comparisons are
    exact.
    """
    locs = F.expr("regexp_extract_all(xml, '<loc>([^<]+)</loc>', 1)")
    mods = F.expr(
        "regexp_extract_all(xml, '<lastmod>2026-08-([0-9]{2})</lastmod>', 1)"
    )
    z = sitemaps.select("host", F.explode(F.arrays_zip(locs.alias("u"), mods.alias("m"))).alias("z"))
    return z.select(
        "host",
        F.col("z.u").alias("url"),
        F.col("z.m").cast("long").alias("lastmod_day"),
    )


def recrawl_decisions(entries: DataFrame) -> DataFrame:
    """(url, lastmod_day, last_fetch_day, fetch) — which sitemap entries
    the scheduler fetches this cycle.

    Policy (the sitemap-protocol contract crawlers actually run):
    fetch a url iff we never fetched it, OR its advertised lastmod is
    newer than our last fetch. The fetch ledger is planted closed-form
    (every 13th url unseen; last_fetch_day = 1 + (doc_id * 3) % 28) so
    oracles replay it; in production it is the frontier table
    (crawl_frontier) bucket-joined on url — same plan shape, one keyed
    join. ``fetch`` is BIGINT 0/1; NULL last_fetch_day means unseen.
    """
    d = F.element_at(F.split("url", "/"), -1).cast("long")
    seen = (d % 13) != 0
    last = F.when(seen, 1 + (d * 3) % 28).cast("long")
    return entries.select(
        "url",
        "lastmod_day",
        last.alias("last_fetch_day"),
        F.when(
            last.isNull() | (F.col("lastmod_day") > last), F.lit(1)
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("fetch"),
    )


def novelty_share(hist: DataFrame, k: int = 3) -> DataFrame:
    """(v, n_shingles, n_new, new_share_1e6) — per crawl snapshot, how
    much of its DISTINCT shingle mass is genuinely new (never seen in
    any earlier crawl). The freshness dashboard a recurring-crawl
    pipeline watches: a snapshot whose novelty share collapses is
    re-fetching the same web; one that spikes signals either real churn
    or an extraction regression.

    Scale shape: distinct (v, shingle) first (map-side partial), then
    ONE shingle-keyed min-aggregate pins each shingle's first version,
    and a self-attach by shingle + a per-v rollup finish it. Nothing is
    quadratic in versions; the shingle key is high-cardinality and
    skew-free. Exact half-up micro-units.
    """
    from hebrew_ner_spark.functions.hashing import shingles_col

    sh = (
        hist.withColumn("toks", F.split("text", " "))
        .select("v", F.explode(shingles_col("toks", k)).alias("shingle"))
        .distinct()
    )
    first = sh.groupBy("shingle").agg(F.min("v").alias("_first_v"))
    return (
        sh.join(first, "shingle")
        .groupBy("v")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum((F.col("_first_v") == F.col("v")).cast("long"))
            .cast("long")
            .alias("n_new"),
        )
        .select(
            "v",
            "n_shingles",
            "n_new",
            F.expr(
                "CAST((2 * n_new * 1000000 + n_shingles)"
                " DIV (2 * n_shingles) AS BIGINT)"
            ).alias("new_share_1e6"),
        )
    )


N_FETCH_SHARDS = 8
HRW_SEED = 17


def _hrw_weight(url_col, shard_col):
    from hebrew_ner_spark.functions.hashing import phash_col

    return phash_col(
        F.concat(url_col, F.lit("|"), shard_col.cast("string")), HRW_SEED
    )


def shard_assignment(
    pages: DataFrame, n_shards: int = N_FETCH_SHARDS
) -> DataFrame:
    """(url, shard) — rendezvous (highest-random-weight) assignment of
    fetch work to ``n_shards`` crawler shards: shard = argmax over s of
    hash(url | s). The fleet-sharding discipline a distributed crawler
    needs and mod-hashing cannot give: when a shard leaves, ONLY its
    keys move (each survivor's winning weight is unchanged), instead of
    (n-1)/n of the corpus reshuffling as with ``hash % n``.

    Scale shape: an n_shards-way explode + one url-keyed
    map-side-combinable argmax (max(struct(w, shard)) — no window, no
    shuffle beyond the keyed agg); n_shards is a fleet-sized constant,
    so the fan-out is bounded and the whole thing is one narrow stage +
    one aggregate. Ties (2^-60 odds) pin to the larger shard id on both
    engines.
    """
    s = F.explode(F.sequence(F.lit(0), F.lit(n_shards - 1))).alias("shard")
    w = pages.select("url", s).withColumn(
        "_w", _hrw_weight(F.col("url"), F.col("shard"))
    )
    return (
        w.groupBy("url")
        .agg(F.max(F.struct(F.col("_w"), F.col("shard").alias("s"))).alias("_m"))
        .select("url", F.col("_m.s").cast("long").alias("shard"))
    )


def shard_rebalance(
    pages: DataFrame, removed: int, n_shards: int = N_FETCH_SHARDS
) -> DataFrame:
    """(url, old_shard, new_shard, moved) — the reassignment after shard
    ``removed`` leaves the fleet. Rendezvous hashing's contract, made
    checkable: moved = 1 exactly for urls whose old winner was the
    removed shard (everyone else's argmax is untouched — their winning
    weight is still present). One shared weight explode feeds both
    argmaxes; the join is url-keyed.
    """
    s = F.explode(F.sequence(F.lit(0), F.lit(n_shards - 1))).alias("shard")
    w = pages.select("url", s).withColumn(
        "_w", _hrw_weight(F.col("url"), F.col("shard"))
    )
    old = (
        w.groupBy("url")
        .agg(F.max(F.struct("_w", F.col("shard").alias("s"))).alias("_m"))
        .select("url", F.col("_m.s").cast("long").alias("old_shard"))
    )
    new = (
        w.where(F.col("shard") != removed)
        .groupBy("url")
        .agg(F.max(F.struct("_w", F.col("shard").alias("s"))).alias("_m"))
        .select("url", F.col("_m.s").cast("long").alias("new_shard"))
    )
    return (
        old.join(new, "url")
        .select(
            "url",
            "old_shard",
            "new_shard",
            (F.col("old_shard") != F.col("new_shard")).cast("long").alias("moved"),
        )
    )
