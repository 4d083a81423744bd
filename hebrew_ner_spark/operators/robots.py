"""robots.txt politeness: longest-match allow/deny over the frontier.

A web-scale crawler (the loop ``crawl_frontier`` feeds) must honour the
Robots Exclusion Protocol before a URL ever reaches a fetch fleet. The
REP decision rule (RFC 9309 §2.2.2): among a host's rules whose path
prefix matches the URL's path, the LONGEST prefix wins; on a length tie
an Allow beats a Disallow; a URL matching no rule is allowed.

Engine shape — this is a *dimension-join* problem, not a scan problem:

* the rules table is host-grain metadata (a handful of rows per host —
  even 10^8 hosts x ~20 rules is GBs, vs the 10^12-row frontier), so the
  match is a broadcast (AQE keeps it broadcast while rules fit; at the
  extreme it degrades to a hash join on ``host``, still key-local);
* prefix match + longest-wins folds into ONE partial-aggregating
  ``max(struct(rule_len, rule_allow))`` per url — no window over the
  frontier, no sort, map-side combine does most of the work;
* unmatched urls never join a rule; the default-allow lands in a
  ``coalesce`` after a left join, zero amplification.

No reference counterpart (the reference crawls nothing); the operator
exists for the north rule's CC-style ingestion loop. Flags are BIGINT
0/1 (output contract bans booleans)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hebrew_ner_spark.operators.weblinks import N_HOST_SHARDS, host_of

# Planted probe shares (of doc_ids): /q/ tie-rule probes and /private/
# probes ride alongside the organic /p/<doc_id> frontier.
Q_PROBE_MOD = 7
PRIVATE_PROBE_MOD = 11


def synth_robots_rules(docs: DataFrame) -> DataFrame:
    """(host, prefix, rule_allow): deterministic per-host rule sets.

    * every host:  Disallow /private/          (plain deny)
    * every host:  Disallow /q/  AND Allow /q/ (length tie -> Allow wins)
    * even shards: Disallow /p/, Allow /p/1, Disallow /p/12
      (three nested prefixes exercising longest-match precedence:
      /p/2 denied, /p/1 and /p/10 allowed, /p/12 and /p/123 denied)
    * odd shards:  no /p/ rules (default allow)
    """
    shards = (
        docs.select((F.col("doc_id") % N_HOST_SHARDS).alias("s"))
        .distinct()
        .select(
            F.concat(
                F.lit("ex"), F.col("s").cast("string"), F.lit(".example.net")
            ).alias("host"),
            "s",
        )
    )
    common = F.array(
        F.struct(F.lit("/private/").alias("prefix"), F.lit(0).alias("rule_allow")),
        F.struct(F.lit("/q/").alias("prefix"), F.lit(0).alias("rule_allow")),
        F.struct(F.lit("/q/").alias("prefix"), F.lit(1).alias("rule_allow")),
    )
    even_extra = F.array(
        F.struct(F.lit("/p/").alias("prefix"), F.lit(0).alias("rule_allow")),
        F.struct(F.lit("/p/1").alias("prefix"), F.lit(1).alias("rule_allow")),
        F.struct(F.lit("/p/12").alias("prefix"), F.lit(0).alias("rule_allow")),
    )
    rules = shards.select(
        "host",
        F.explode(
            F.when(F.col("s") % 2 == 0, F.concat(common, even_extra)).otherwise(
                common
            )
        ).alias("r"),
    )
    return rules.select(
        "host",
        F.col("r.prefix").alias("prefix"),
        F.col("r.rule_allow").cast("long").alias("rule_allow"),
    )


def synth_probe_urls(docs: DataFrame) -> DataFrame:
    """(url,): the organic /p/<doc_id> frontier plus planted /q/ and
    /private/ probes (every rule class gets hit at every gated scale)."""
    shard = (F.col("doc_id") % N_HOST_SHARDS).cast("string")
    base = F.concat(F.lit("https://ex"), shard, F.lit(".example.net"))
    organic = docs.select(
        F.concat(base, F.lit("/p/"), F.col("doc_id").cast("string")).alias("url")
    )
    q_probes = docs.where(F.col("doc_id") % Q_PROBE_MOD == 0).select(
        F.concat(base, F.lit("/q/"), F.col("doc_id").cast("string")).alias("url")
    )
    private_probes = docs.where(F.col("doc_id") % PRIVATE_PROBE_MOD == 0).select(
        F.concat(base, F.lit("/private/x"), F.col("doc_id").cast("string")).alias(
            "url"
        )
    )
    return organic.unionByName(q_probes).unionByName(private_probes)


def robots_decisions(urls: DataFrame, rules: DataFrame) -> DataFrame:
    """(url, host, allowed, rule_len): the REP verdict per url.

    ``allowed`` is BIGINT 0/1; ``rule_len`` is the matched prefix length
    (0 when no rule matched — the default-allow case). ONE left
    broadcast join with the prefix predicate in the join condition +
    ONE partial-aggregating max(struct) — an unmatched url keeps its
    row with a null rule (default-allow folds in via coalesce), so the
    frontier is read once, never sorted, windowed, re-joined to itself,
    or amplified beyond its matching rules."""
    u = urls.select(
        "url",
        host_of(F.col("url")).alias("host"),
        F.regexp_replace("url", "^[a-zA-Z]+://[^/]*", "").alias("_path"),
    )
    r = rules.select(
        F.col("host").alias("_rhost"), "prefix", F.col("rule_allow")
    )
    return (
        u.join(
            F.broadcast(r),
            (u["host"] == r["_rhost"]) & F.col("_path").startswith(F.col("prefix")),
            "left",
        )
        .groupBy("url", "host")
        .agg(
            F.max(
                F.struct(
                    F.coalesce(F.length("prefix").cast("long"), F.lit(0)).alias(
                        "rule_len"
                    ),
                    F.coalesce(F.col("rule_allow"), F.lit(1)).alias("allowed"),
                )
            ).alias("_m")
        )
        .select(
            "url",
            "host",
            F.col("_m.allowed").cast("long").alias("allowed"),
            F.col("_m.rule_len").cast("long").alias("rule_len"),
        )
    )


def host_blocked_share(decisions: DataFrame) -> DataFrame:
    """(host, n_urls, n_blocked, blocked_share_1e6): per-host deny rate
    in exact micro-units (half-up DIV idiom) — the politeness dashboard
    a crawl operator reads before re-budgeting a host."""
    return decisions.groupBy("host").agg(
        F.count("*").cast("long").alias("n_urls"),
        F.sum(F.lit(1) - F.col("allowed")).cast("long").alias("n_blocked"),
        F.expr(
            "CAST((2 * 1000000 * sum(1 - allowed) + count(*)) DIV (2 * count(*)) AS BIGINT)"
        ).alias("blocked_share_1e6"),
    )
