"""Gates: crawl history, latest-snapshot dedup, change deltas, as-of join.

The as-of oracle uses DuckDB's NATIVE ``ASOF LEFT JOIN`` — the strongest
possible cross-check for the Spark union-trick implementation (two
entirely different algorithms, same semantics). The history CTE
reconstructs every crawl version closed-form from ``documents``; the
version count is imported from the operator so retuning cannot desync
plan and oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hebrew_ner_spark.functions.hashing import shingles_duck
from hebrew_ner_spark.operators import crawl, linking
from hebrew_ner_spark.operators.crawl import CRAWL_VERSIONS
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table

_VERSIONS_SQL = "unnest([" + ", ".join(str(v) for v in range(CRAWL_VERSIONS)) + "])"

_HIST_CTE = f"""
hist AS (
  SELECT 'https://example.org/' || lang || '/doc/' || CAST(doc_id AS VARCHAR) AS url,
         TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 SECOND
                                         + v * INTERVAL 1 DAY AS warc_ts,
         CASE WHEN v = 0 THEN text
              WHEN v = 1 THEN text || ' dup'
              WHEN doc_id % 2 = 0 THEN text || ' dup dup'
              ELSE text || ' dup' END AS text,
         lang,
         CAST(v AS BIGINT) AS v
  FROM documents, (SELECT {_VERSIONS_SQL} AS v)
)
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return crawl.synth_crawl_history(_docs(spark, sf_dir))


# Gate outputs carry epoch-millis BIGINTs, not raw timestamps — the
# extract_q precedent: pandas dtype units differ between the two engines
# (datetime64[ns] vs [us]) even when every value matches.


@query(
    "web_crawl_history",
    oracle=f"WITH {_HIST_CTE} SELECT url, epoch_ms(warc_ts) AS warc_ms, text, lang, v FROM hist",
)
def web_crawl_history(spark, sf_dir):
    """The multi-snapshot page table itself — pins the synthesis."""
    h = _hist(spark, sf_dir)
    return h.select("url", F.unix_millis("warc_ts").alias("warc_ms"), "text", "lang", "v")


@query(
    "web_latest_crawl",
    oracle=f"""
    WITH {_HIST_CTE}
    SELECT url, epoch_ms(max(warc_ts)) AS warc_ms, arg_max(text, warc_ts) AS text
    FROM hist GROUP BY url
    """,
)
def web_latest_crawl(spark, sf_dir):
    """Newest snapshot per url (max_by aggregate, one shuffle)."""
    lc = crawl.latest_crawl(_hist(spark, sf_dir))
    return lc.select("url", F.unix_millis("warc_ts").alias("warc_ms"), "text")


@query(
    "web_crawl_deltas",
    oracle=f"""
    WITH {_HIST_CTE}
    SELECT url, epoch_ms(warc_ts) AS warc_ms, v,
           CAST(lag(text) OVER w IS NULL OR text <> lag(text) OVER w AS BIGINT) AS changed
    FROM hist
    WINDOW w AS (PARTITION BY url ORDER BY warc_ts)
    """,
)
def web_crawl_deltas(spark, sf_dir):
    """Per-url change flags between consecutive crawls."""
    d = crawl.crawl_deltas(_hist(spark, sf_dir))
    # booleans are hash-fragile across engines (output contract): 0/1 BIGINT
    return d.select(
        "url",
        F.unix_millis("warc_ts").alias("warc_ms"),
        "v",
        F.col("changed").cast("long").alias("changed"),
    )


@query(
    "web_asof_probe",
    oracle=f"""
    WITH {_HIST_CTE},
    v0 AS (SELECT url, warc_ts FROM hist WHERE v = 0),
    probes AS (
      SELECT url, warc_ts + INTERVAL 36 HOUR AS probe_ts FROM v0
      UNION ALL
      SELECT url, warc_ts - INTERVAL 1 HOUR AS probe_ts FROM v0
    )
    SELECT p.url, epoch_ms(p.probe_ts) AS probe_ms,
           coalesce(epoch_ms(h.warc_ts), -1) AS warc_ms,
           coalesce(h.text, '') AS text
    FROM probes p
    ASOF LEFT JOIN hist h ON p.url = h.url AND p.probe_ts >= h.warc_ts
    """,
)
def web_asof_probe(spark, sf_dir):
    """Spark union-trick as-of join vs DuckDB's native ASOF LEFT JOIN.

    Two probes per url: +36 h after the first crawl (must resolve to the
    v1 snapshot — after v1 at +24 h, before v2 at +48 h) and -1 h before
    it (must resolve to NULL). Different algorithm on each engine, same
    semantics — the strongest oracle in the crawl family.
    """
    hist = _hist(spark, sf_dir)
    v0 = hist.where(F.col("v") == 0).select("url", "warc_ts")
    probes = v0.select(
        "url", F.expr("warc_ts + make_interval(0, 0, 0, 0, 36, 0, 0)").alias("probe_ts")
    ).unionByName(
        v0.select(
            "url", F.expr("warc_ts - make_interval(0, 0, 0, 0, 1, 0, 0)").alias("probe_ts")
        )
    )
    j = crawl.asof_join(probes, hist.select("url", "warc_ts", "text"), key="url")
    # no-match probes surface as -1/'' (a NULL bigint would round-trip
    # through pandas as float64 NaN on one engine and not the other)
    return j.select(
        "url",
        F.unix_millis("probe_ts").alias("probe_ms"),
        F.coalesce(F.unix_millis("warc_ts"), F.lit(-1)).alias("warc_ms"),
        F.coalesce("text", F.lit("")).alias("text"),
    )


def _merge_oracle() -> str:
    """Base graph over the v0 corpus merged with edges from pages the
    latest crawl CHANGED (v2 text differs from v1 exactly for even
    doc_ids, whose v2 snapshot is text || ' dup dup')."""
    from hebrew_ner_spark.querydefs.graph_q import _dim_values, _edges_ctes

    return f"""
    WITH {_dim_values()},
    delta_docs AS (
      SELECT doc_id, text || ' dup dup' AS text
      FROM documents WHERE doc_id % 2 = 0
    ),
    {_edges_ctes()},
    {_edges_ctes('d_', src='delta_docs')}
    SELECT coalesce(b.subj_id, d.subj_id) AS subj_id,
           coalesce(b.pred, d.pred) AS pred,
           coalesce(b.obj_id, d.obj_id) AS obj_id,
           CAST(coalesce(b.n_evidence, 0) + coalesce(d.n_evidence, 0) AS BIGINT)
             AS n_evidence,
           CAST(CASE WHEN b.subj_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_new
    FROM e b FULL OUTER JOIN d_e d
      ON b.subj_id = d.subj_id AND b.pred = d.pred AND b.obj_id = d.obj_id
    """


@query("web_crawl_to_kg_delta", oracle=_merge_oracle())
def web_crawl_to_kg_delta(spark, sf_dir):
    """The incremental crawl->graph lifecycle closed end to end: the
    change detector (crawl_deltas) finds pages the newest crawl edited,
    ONLY those pages re-run triple extraction + linking, and the delta
    edge counts fold into the base graph without rescanning it
    (merge_edge_counts — the Iceberg MERGE INTO shape). Evidence
    accumulates across crawl snapshots; is_new flags edges the base
    graph had never seen."""
    docs = _docs(spark, sf_dir)
    hist = _hist(spark, sf_dir)
    changed = (
        crawl.crawl_deltas(hist)
        .where((F.col("v") == CRAWL_VERSIONS - 1) & F.col("changed"))
        .join(hist.select("url", "warc_ts", "text"), ["url", "warc_ts"])
        .select(
            F.element_at(F.split("url", "/"), -1).cast("long").alias("doc_id"),
            "text",
        )
    )
    base = linking.kg_edges(docs)
    delta = linking.kg_edges(changed)
    return linking.merge_edge_counts(base, delta)


# --- temporal triple scoping -------------------------------------------------

from hebrew_ner_spark.operators import kg as _kg  # noqa: E402
from hebrew_ner_spark.resources import ENTITY_TERMS, PREDICATE_TERMS  # noqa: E402

_ENTS = "(" + ", ".join(f"'{t}'" for t in sorted(ENTITY_TERMS)) + ")"
_PREDS = "(" + ", ".join(f"'{t}'" for t in sorted(PREDICATE_TERMS)) + ")"

# Non-vacuity by construction: snapshot v drops the page's first 3*v
# tokens, so triples anchored in the dropped prefix genuinely disappear
# over time — first_ms/last_ms/n_sightings vary per triple (the synth
# crawl history only APPENDS filler, under which every interval would
# degenerately span all snapshots).
_SNAP_CTE = """
sn AS (
  SELECT 'https://example.org/doc/' || CAST(doc_id AS VARCHAR) AS url,
         doc_id * 1000 + v * 86400000 AS ms,
         array_to_string(
           list_slice(string_split(text, ' '), v * 3 + 1,
                      len(string_split(text, ' '))), ' ') AS text
  FROM documents, (SELECT unnest([0, 1, 2]) AS v)
)
"""


@query(
    "kg_triple_validity",
    oracle=f"""
    WITH {_SNAP_CTE},
    st AS (
      SELECT url, ms,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS wi,
             unnest(string_split(text, ' ')) AS token
      FROM sn),
    sw AS (
      SELECT url, ms, token,
             lag(token)  OVER (PARTITION BY url, ms ORDER BY wi) AS subj,
             lead(token) OVER (PARTITION BY url, ms ORDER BY wi) AS obj
      FROM st),
    tt AS (
      SELECT url, ms, subj, token AS pred, obj FROM sw
      WHERE token IN {_PREDS} AND subj IN {_ENTS} AND obj IN {_ENTS})
    SELECT subj, pred, obj,
           min(ms) AS first_ms, max(ms) AS last_ms,
           count(DISTINCT (url, ms)) AS n_sightings,
           count(DISTINCT url) AS n_pages
    FROM tt GROUP BY subj, pred, obj
    """,
)
def kg_triple_validity(spark, sf_dir):
    """Temporal scoping of triples over a 3-snapshot corpus where version
    v drops the first 3*v tokens — facts anchored early in a page vanish
    in later crawls, so validity intervals and sighting counts genuinely
    vary (closed-form oracle reconstructs every snapshot)."""
    docs = _docs(spark, sf_dir)
    toks = F.split("text", " ")
    snaps = docs.select(
        "doc_id", "text", F.explode(F.sequence(F.lit(0), F.lit(2))).alias("v")
    ).select(
        F.concat(
            F.lit("https://example.org/doc/"), F.col("doc_id").cast("string")
        ).alias("url"),
        F.timestamp_millis(
            F.col("doc_id") * 1000 + F.col("v").cast("long") * 86400000
        ).alias("warc_ts"),
        F.array_join(
            F.slice(toks, F.col("v") * 3 + 1, F.size(toks)), " "
        ).alias("text"),
    )
    return _kg.triple_validity(snaps)


@query(
    "kg_fact_decay",
    oracle=f"""
    WITH {_SNAP_CTE},
    st AS (
      SELECT url, ms,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS wi,
             unnest(string_split(text, ' ')) AS token
      FROM sn),
    sw AS (
      SELECT url, ms, token,
             lag(token)  OVER (PARTITION BY url, ms ORDER BY wi) AS subj,
             lead(token) OVER (PARTITION BY url, ms ORDER BY wi) AS obj
      FROM st),
    tt AS (
      SELECT url, ms, subj, token AS pred, obj FROM sw
      WHERE token IN {_PREDS} AND subj IN {_ENTS} AND obj IN {_ENTS}),
    v AS (
      SELECT subj, pred, obj,
             max(ms) AS last_ms,
             count(DISTINCT (url, ms)) AS n_sightings
      FROM tt GROUP BY subj, pred, obj),
    nw AS (SELECT max(last_ms) AS _now FROM v)
    SELECT subj, pred, obj,
           n_sightings, last_ms,
           CAST((_now - last_ms) // {_kg.FACT_HALF_LIFE_MS} AS BIGINT)
             AS age_half_lives,
           CAST((n_sightings * 1000000) //
                (CAST(1 AS BIGINT) <<
                 least((_now - last_ms) // {_kg.FACT_HALF_LIFE_MS}, 62))
             AS BIGINT) AS decayed_1e6
    FROM v CROSS JOIN nw
    """,
)
def kg_fact_decay(spark, sf_dir):
    """Staleness-discounted fact confidence: binary half-life decay
    against the deterministic corpus clock (operators/kg.py fact_decay
    — broadcast scalar max + one codegen expression over the
    triple_validity aggregate)."""
    docs = _docs(spark, sf_dir)
    toks = F.split("text", " ")
    snaps = docs.select(
        "doc_id", "text", F.explode(F.sequence(F.lit(0), F.lit(2))).alias("v")
    ).select(
        F.concat(
            F.lit("https://example.org/doc/"), F.col("doc_id").cast("string")
        ).alias("url"),
        F.timestamp_millis(
            F.col("doc_id") * 1000 + F.col("v").cast("long") * 86400000
        ).alias("warc_ts"),
        F.array_join(
            F.slice(toks, F.col("v") * 3 + 1, F.size(toks)), " "
        ).alias("text"),
    )
    return _kg.fact_decay(snaps)


# ---------------------------------------------------------------------------
# Sitemap ingestion + recrawl scheduling
# ---------------------------------------------------------------------------

_SM_ENTRIES = """
sm_e AS (
  SELECT 'h' || CAST(doc_id % 20 AS VARCHAR) || '.example.org' AS host,
         'https://h' || CAST(doc_id % 20 AS VARCHAR) || '.example.org/p/'
           || CAST(doc_id AS VARCHAR) AS url,
         CAST(1 + doc_id % 28 AS BIGINT) AS lastmod_day,
         doc_id
  FROM documents
)
"""


@query(
    "web_sitemap_urls",
    oracle=f"""
    WITH {_SM_ENTRIES}
    SELECT host, url, lastmod_day FROM sm_e
    """,
)
def web_sitemap_urls(spark, sf_dir):
    """Sitemap synthesis -> XML parse round trip: the parsed (host, url,
    lastmod) entries must equal the closed form the XML encodes."""
    return crawl.sitemap_urls(crawl.synth_sitemaps(_docs(spark, sf_dir)))


@query(
    "web_sitemap_recrawl",
    oracle=f"""
    WITH {_SM_ENTRIES}
    SELECT url, lastmod_day,
           CASE WHEN doc_id % 13 <> 0
                THEN CAST(1 + (doc_id * 3) % 28 AS BIGINT) END AS last_fetch_day,
           CAST(CASE WHEN doc_id % 13 = 0
                      OR 1 + doc_id % 28 > 1 + (doc_id * 3) % 28
                THEN 1 ELSE 0 END AS BIGINT) AS fetch
    FROM sm_e
    """,
)
def web_sitemap_recrawl(spark, sf_dir):
    """Sitemap-driven recrawl policy: fetch unseen urls and urls whose
    advertised lastmod is newer than the planted fetch ledger."""
    return crawl.recrawl_decisions(
        crawl.sitemap_urls(crawl.synth_sitemaps(_docs(spark, sf_dir)))
    )


@query(
    "web_novelty_share",
    oracle=f"""
    WITH {_HIST_CTE},
    nv_sh AS (
      SELECT DISTINCT v,
             unnest({shingles_duck("string_split(text, ' ')", 3)}) AS shingle
      FROM hist
    ),
    nv_first AS (SELECT shingle, min(v) AS first_v FROM nv_sh GROUP BY 1)
    SELECT s.v,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN f.first_v = s.v THEN 1 ELSE 0 END) AS BIGINT)
             AS n_new,
           CAST((2 * sum(CASE WHEN f.first_v = s.v THEN 1 ELSE 0 END) * 1000000
                 + count(*)) // (2 * count(*)) AS BIGINT) AS new_share_1e6
    FROM nv_sh s JOIN nv_first f USING (shingle)
    GROUP BY s.v
    """,
)
def web_novelty_share(spark, sf_dir):
    """Per-snapshot novel-shingle share across the crawl history: one
    shingle-keyed min-aggregate pins each shingle's first version; v0
    is 1e6 by construction, later crawls only add trailing-'dup' mass
    (operators/crawl.py novelty_share)."""
    return crawl.novelty_share(_hist(spark, sf_dir))


# ---------------------------------------------------------------------------
# Rendezvous (HRW) fetch-shard assignment + minimal-disruption rebalance
# ---------------------------------------------------------------------------

from hebrew_ner_spark.functions.hashing import phash_duck  # noqa: E402

_HRW_REMOVED = 3  # the shard the rebalance gate takes out of the fleet
_HRW_W = phash_duck(
    "url || '|' || CAST(s.shard AS VARCHAR)", crawl.HRW_SEED
)
_HRW_URLS = (
    "SELECT 'https://example.org/' || lang || '/doc/'"
    " || CAST(doc_id AS VARCHAR) AS url FROM documents"
)
_HRW_W_CTE = f"""
sa_u AS ({_HRW_URLS}),
sa_w AS (
  SELECT url, s.shard, {_HRW_W} AS w
  FROM sa_u, (SELECT unnest(range({crawl.N_FETCH_SHARDS})) AS shard) s
)
"""


def _hrw_pages(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select(
        F.concat(
            F.lit("https://example.org/"),
            F.col("lang"),
            F.lit("/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url")
    )


@query(
    "web_shard_assign",
    oracle=f"""
    WITH {_HRW_W_CTE},
    sa_r AS (
      SELECT url, shard,
             row_number() OVER (PARTITION BY url ORDER BY w DESC, shard DESC)
               AS rn
      FROM sa_w
    )
    SELECT url, CAST(shard AS BIGINT) AS shard FROM sa_r WHERE rn = 1
    """,
)
def web_shard_assign(spark, sf_dir):
    """Rendezvous-hash fetch-shard assignment: shard = argmax over s of
    hash(url | s) — bounded n_shards explode + one url-keyed map-side
    argmax, no window (operators/crawl.py shard_assignment)."""
    return crawl.shard_assignment(_hrw_pages(spark, sf_dir))


@query(
    "web_shard_rebalance",
    oracle=f"""
    WITH {_HRW_W_CTE},
    sr_old AS (
      SELECT url, shard FROM (
        SELECT url, shard,
               row_number() OVER (PARTITION BY url ORDER BY w DESC, shard DESC)
                 AS rn
        FROM sa_w) WHERE rn = 1
    ),
    sr_new AS (
      SELECT url, shard FROM (
        SELECT url, shard,
               row_number() OVER (PARTITION BY url ORDER BY w DESC, shard DESC)
                 AS rn
        FROM sa_w WHERE shard <> {_HRW_REMOVED}) WHERE rn = 1
    )
    SELECT o.url, CAST(o.shard AS BIGINT) AS old_shard,
           CAST(n.shard AS BIGINT) AS new_shard,
           CAST(CASE WHEN o.shard <> n.shard THEN 1 ELSE 0 END AS BIGINT)
             AS moved
    FROM sr_old o JOIN sr_new n USING (url)
    """,
)
def web_shard_rebalance(spark, sf_dir):
    """Rendezvous hashing's minimal-disruption contract, checkable:
    after shard {removed} leaves, moved = 1 exactly for its former urls
    — every survivor's argmax is untouched (operators/crawl.py
    shard_rebalance)."""
    return crawl.shard_rebalance(_hrw_pages(spark, sf_dir), _HRW_REMOVED)


@query(
    "txt_drift_tv",
    oracle=f"""
    WITH {_HIST_CTE},
    tv_a AS (
      SELECT token, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS token
            FROM hist WHERE v = 0)
      WHERE token <> '' GROUP BY 1
    ),
    tv_b AS (
      SELECT token, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS token
            FROM hist WHERE v = 2)
      WHERE token <> '' GROUP BY 1
    ),
    tv_j AS (
      SELECT coalesce(a.c, 0) AS ca, coalesce(b.c, 0) AS cb
      FROM tv_a a FULL OUTER JOIN tv_b b USING (token)
    ),
    tv_t AS (
      SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
             CAST(count(*) AS BIGINT) AS nt
      FROM tv_j
    ),
    tv_s AS (
      SELECT CAST(sum(abs(ca * nb - cb * na)) AS BIGINT) AS num
      FROM tv_j, tv_t
    )
    SELECT na AS n_tokens_a, nb AS n_tokens_b, nt AS n_types,
           CAST((2 * num * 1000000 + 2 * na * nb)
                // (2 * 2 * na * nb) AS BIGINT) AS tv_1e6
    FROM tv_t, tv_s
    """,
)
def txt_drift_tv(spark, sf_dir):
    """Exact total-variation distance between crawl v0 and v2 token
    distributions: per-type rounding never happens — one integer
    cross-multiplied sum, divided once at the end. Token-keyed
    full-outer join + scalar fold (operators/textstats.py
    token_drift_tv)."""
    from hebrew_ner_spark.operators.textstats import token_drift_tv

    return token_drift_tv(_hist(spark, sf_dir), 0, 2)


@query(
    "txt_drift_heavy",
    oracle=f"""
    WITH {_HIST_CTE},
    dh_a AS (
      SELECT token, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS token
            FROM hist WHERE v = 0)
      WHERE token <> '' GROUP BY 1
    ),
    dh_b AS (
      SELECT token, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS token
            FROM hist WHERE v = 2)
      WHERE token <> '' GROUP BY 1
    ),
    dh_j AS (
      SELECT coalesce(a.token, b.token) AS token,
             coalesce(a.c, 0) AS c_a, coalesce(b.c, 0) AS c_b
      FROM dh_a a FULL OUTER JOIN dh_b b USING (token)
    ),
    dh_t AS (SELECT CAST(sum(c_a) AS BIGINT) AS na,
                    CAST(sum(c_b) AS BIGINT) AS nb FROM dh_j),
    dh_r AS (
      SELECT token, c_a, c_b,
             CAST(abs(c_a * nb - c_b * na) AS BIGINT) AS delta_x,
             row_number() OVER (ORDER BY abs(c_a * nb - c_b * na) DESC, token)
               AS rank
      FROM dh_j, dh_t
    )
    SELECT token, c_a, c_b, delta_x, CAST(rank AS BIGINT) AS rank
    FROM dh_r WHERE rank <= {20}
    """,
)
def txt_drift_heavy(spark, sf_dir):
    """The 20 tokens driving the v0 -> v2 drift, ranked by the exact
    cross-multiplied mass the TV distance sums — WindowGroupLimit
    partial top-k so the vocabulary never funnels through one task
    (operators/textstats.py token_drift_heavy)."""
    from hebrew_ner_spark.operators.textstats import token_drift_heavy

    return token_drift_heavy(_hist(spark, sf_dir), 0, 2)


@query(
    "web_scd2_dim",
    oracle=f"""
    WITH {_HIST_CTE},
    sc AS (
      SELECT url, warc_ts, text,
             CASE WHEN lag(text) OVER w IS NULL
                       OR text <> lag(text) OVER w THEN 1 ELSE 0 END AS chg
      FROM hist WINDOW w AS (PARTITION BY url ORDER BY warc_ts)
    ),
    sr AS (SELECT url, warc_ts, text FROM sc WHERE chg = 1)
    SELECT url, text,
           epoch_ms(warc_ts) AS valid_from_ms,
           coalesce(epoch_ms(lead(warc_ts) OVER w), -1) AS valid_to_ms,
           CAST(lead(warc_ts) OVER w IS NULL AS BIGINT) AS is_current,
           CAST(row_number() OVER w AS BIGINT) AS version_no
    FROM sr WINDOW w AS (PARTITION BY url ORDER BY warc_ts)
    """,
)
def web_scd2_dim(spark, sf_dir):
    """SCD Type-2 dimension from the crawl history: consecutive
    identical-text snapshots collapse into one [valid_from, valid_to)
    row (odd doc_ids' v1/v2 snapshots are byte-identical by
    construction, so the collapse is non-vacuous at every scale).
    Open rows carry valid_to = -1 / is_current = 1. One shuffle on url
    (operators/maintenance.py scd2_collapse)."""
    from hebrew_ner_spark.operators.maintenance import scd2_collapse

    d = scd2_collapse(_hist(spark, sf_dir))
    return d.select(
        "url",
        "text",
        F.unix_millis("valid_from").alias("valid_from_ms"),
        F.coalesce(F.unix_millis("valid_to"), F.lit(-1)).alias("valid_to_ms"),
        F.col("is_current").cast("long").alias("is_current"),
        "version_no",
    )


@query(
    "txt_drift_psi",
    oracle=f"""
    WITH {_HIST_CTE},
    ps_a AS (
      SELECT token, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS token
            FROM hist WHERE v = 0)
      WHERE token <> '' GROUP BY 1
    ),
    ps_b AS (
      SELECT token, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS token
            FROM hist WHERE v = 2)
      WHERE token <> '' GROUP BY 1
    ),
    ps_j AS (
      SELECT coalesce(a.c, 0) AS ca, coalesce(b.c, 0) AS cb
      FROM ps_a a FULL OUTER JOIN ps_b b USING (token)
    ),
    ps_t AS (
      SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
             CAST(count(*) AS BIGINT) AS nt
      FROM ps_j
    ),
    ps_x AS (
      SELECT na, nb, nt,
             (ca + 1) * (nb + nt) AS xa, (cb + 1) * (na + nt) AS xb
      FROM ps_j, ps_t
    ),
    ps_s AS (
      SELECT CAST(sum((xa - xb) * (CAST(length(bin(xa)) AS BIGINT)
                                   - CAST(length(bin(xb)) AS BIGINT)))
                  AS BIGINT) AS num
      FROM ps_x
    )
    SELECT na AS n_tokens_a, nb AS n_tokens_b, nt AS n_types,
           CAST((2 * num * 1000 + (na + nt) * (nb + nt))
                // (2 * (na + nt) * (nb + nt)) AS BIGINT) AS psi_bits_1e3
    FROM ps_t, ps_s
    """,
)
def txt_drift_psi(spark, sf_dir):
    """Population Stability Index between crawl v0 and v2 in pinned
    milli-bit units (add-one smoothing, bitlen log2, sign-consistent
    non-negative terms) — the PSI twin of txt_drift_tv
    (operators/textstats.py token_drift_psi)."""
    from hebrew_ner_spark.operators.textstats import token_drift_psi

    return token_drift_psi(_hist(spark, sf_dir), 0, 2)
