"""Gates: href extraction, URL canonicalization, host graph, degrees,
host PageRank, link resolution.

Every oracle reconstructs the expected output CLOSED-FORM from
``documents`` (the synthesis in ``operators/weblinks.py`` is a pure
function of doc_id) — it never re-runs the regex extractor or the
canonicalization chain, so the two engines reach each value by entirely
different routes. The host-PageRank oracle reuses the unrolled
exact-integer power-iteration CTEs from ``graph_q`` over the host edge
list; the iteration count is imported from the operator so retuning
cannot desync plan and oracle.

Resolution semantics pinned by construction: root-relative anchors
(``k % 3 == 1``) resolve against their OWN page's host, so they reach an
existing page only when ``doc_id % 4 == t % 4``; targets ``t >= n_docs``
are dangling everywhere. The oracle states both rules arithmetically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hebrew_ner_spark.operators import weblinks
from hebrew_ner_spark.operators.pagerank import PAGERANK_ITERS
from hebrew_ner_spark.operators.weblinks import N_HOST_SHARDS
from hebrew_ner_spark.querydefs.graph_q import _pagerank_ctes
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table

# Closed-form link set: doc i carries anchors k = 0..(i % 3); anchor k
# targets t = (i*7 + 13*(k+1)) % M with M = n + 1 + n//8 (t >= n dangles).
_LINKS_CTE = f"""
nd AS (SELECT count(*) AS n FROM documents),
lk AS (
  SELECT d.doc_id, CAST(ks.k AS BIGINT) AS k,
         (d.doc_id * 7 + 13 * (ks.k + 1)) % (nd.n + 1 + nd.n // 8) AS t,
         nd.n AS n
  FROM documents d, nd, (SELECT unnest([0, 1, 2]) AS k) ks
  WHERE ks.k <= d.doc_id % 3
),
cn AS (
  SELECT doc_id, k, t, n,
         'ex' || CAST(doc_id % {N_HOST_SHARDS} AS VARCHAR) || '.example.net'
           AS src_host,
         CASE WHEN k % 3 = 1
              THEN 'ex' || CAST(doc_id % {N_HOST_SHARDS} AS VARCHAR)
                        || '.example.net'
              ELSE 'ex' || CAST(t % {N_HOST_SHARDS} AS VARCHAR)
                        || '.example.net' END AS dst_host,
         CASE WHEN k % 3 = 1 AND t < n
                   AND doc_id % {N_HOST_SHARDS} = t % {N_HOST_SHARDS} THEN 1
              WHEN k % 3 <> 1 AND t < n THEN 1
              ELSE 0 END AS hit
  FROM lk
),
lg AS (
  SELECT src_host, dst_host, CAST(count(*) AS BIGINT) AS n_links
  FROM cn GROUP BY src_host, dst_host
)
"""


def _pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    return weblinks.synth_linked_pages(load_table(spark, sf_dir, "documents"))


@query(
    "web_out_links",
    oracle=f"""
    WITH {_LINKS_CTE}
    SELECT 'https://' || src_host || '/p/' || CAST(doc_id AS VARCHAR) AS url,
           k,
           CASE WHEN k % 3 = 0
                THEN 'https://ex' || CAST(t % {N_HOST_SHARDS} AS VARCHAR)
                     || '.example.net/p/' || CAST(t AS VARCHAR)
                WHEN k % 3 = 1
                THEN '/p/' || CAST(t AS VARCHAR) || '?utm_source=synth#s'
                     || CAST(k AS VARCHAR)
                ELSE '//ex' || CAST(t % {N_HOST_SHARDS} AS VARCHAR)
                     || '.example.net/p/' || CAST(t AS VARCHAR) || '/'
           END AS href,
           'https://' || dst_host || '/p/' || CAST(t AS VARCHAR) AS canon,
           dst_host
    FROM cn
    """,
)
def web_out_links(spark, sf_dir):
    """Anchor extraction + canonicalization, pinned per (page, position):
    the Spark side runs regexp_extract_all over real html bytes and the
    full when-chain canonicalizer; the oracle states each expected url
    arithmetically."""
    return weblinks.out_links(_pages(spark, sf_dir))


@query(
    "web_link_graph",
    oracle=f"WITH {_LINKS_CTE} SELECT src_host, dst_host, n_links FROM lg",
)
def web_link_graph(spark, sf_dir):
    """Host-level link multigraph (one aggregation shuffle)."""
    return weblinks.link_edges(_pages(spark, sf_dir))


@query(
    "web_link_graph_salted",
    oracle=f"WITH {_LINKS_CTE} SELECT src_host, dst_host, n_links FROM lg",
)
def web_link_graph_salted(spark, sf_dir):
    """Plan-twin of web_link_graph through two-phase salted aggregation
    (mega-host skew shape); identical output by construction."""
    return weblinks.link_edges_salted(_pages(spark, sf_dir))


@query(
    "web_host_degrees",
    oracle=f"""
    WITH {_LINKS_CTE},
    two_way AS (
      SELECT src_host AS host, n_links AS out_links, 1 AS out_hosts,
             0 AS in_links, 0 AS in_hosts FROM lg
      UNION ALL
      SELECT dst_host, 0, 0, n_links, 1 FROM lg
    )
    SELECT host,
           CAST(sum(out_links) AS BIGINT) AS out_links,
           CAST(sum(out_hosts) AS BIGINT) AS out_hosts,
           CAST(sum(in_links) AS BIGINT) AS in_links,
           CAST(sum(in_hosts) AS BIGINT) AS in_hosts
    FROM two_way GROUP BY host
    """,
)
def web_host_degrees(spark, sf_dir):
    """Per-host in/out degree, single union->groupBy shuffle."""
    return weblinks.host_degrees(weblinks.link_edges(_pages(spark, sf_dir)))


@query(
    "web_host_pagerank",
    oracle=f"""
    WITH {_LINKS_CTE},
    e AS (SELECT src_host AS subj_id, dst_host AS obj_id,
                 n_links AS n_evidence FROM lg),
    {_pagerank_ctes(PAGERANK_ITERS)}
    SELECT id AS host, pr AS pr_1e6 FROM p{PAGERANK_ITERS}
    """,
)
def web_host_pagerank(spark, sf_dir):
    """Host authority: the exact-integer PageRank operator re-targeted at
    the host graph (same unrolled-CTE oracle as kg_pagerank)."""
    from hebrew_ner_spark.operators import pagerank

    edges = weblinks.link_edges(_pages(spark, sf_dir)).select(
        F.col("src_host").alias("subj_id"),
        F.col("dst_host").alias("obj_id"),
        F.col("n_links").alias("n_evidence"),
    )
    pr = pagerank.entity_pagerank(edges)
    return pr.select(F.col("entity_id").alias("host"), "pr_1e6")


@query(
    "web_link_resolution",
    oracle=f"""
    WITH {_LINKS_CTE}
    SELECT src_host,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(hit) AS BIGINT) AS n_resolved,
           CAST(count(*) - sum(hit) AS BIGINT) AS n_dangling
    FROM cn GROUP BY src_host
    """,
)
def web_link_resolution(spark, sf_dir):
    """Crawl-frontier primitive: canonical targets left-joined against
    the page-url set; dangling = pages this crawl does not have."""
    return weblinks.link_resolution(_pages(spark, sf_dir))


_TERMS_SQL = "[" + ", ".join(f"'{t}'" for t in weblinks.ANCHOR_TERMS) + "]"


@query(
    "web_anchor_evidence",
    oracle=f"""
    WITH {_LINKS_CTE}
    SELECT 'https://' || dst_host || '/p/' || CAST(t AS VARCHAR) AS canon,
           ({_TERMS_SQL})[CAST((t + k) % {len(weblinks.ANCHOR_TERMS)} AS INT) + 1]
             AS anchor_text,
           CAST(count(*) AS BIGINT) AS n
    FROM cn GROUP BY 1, 2
    """,
)
def web_anchor_evidence(spark, sf_dir):
    """Anchor-text naming signal: per canonical target, how often each
    link text refers to it — extraction parses whole <a> fragments in
    one codegen pass; the oracle rebuilds every (target, term) pair from
    doc_id arithmetic (terms cycle the entity vocabulary)."""
    return weblinks.anchor_evidence(_pages(spark, sf_dir))


from hebrew_ner_spark.operators.textstats import quality_pass_sql  # noqa: E402

_HOST_Q_CTE = f"""
hq AS (
  SELECT 'ex' || CAST(doc_id % {N_HOST_SHARDS} AS VARCHAR) || '.example.net'
           AS host,
         CAST(count(*) AS BIGINT) AS n_pages,
         CAST(sum(p) AS BIGINT) AS n_pass,
         CAST((2 * sum(p) * 1000000 + count(*)) // (2 * count(*)) AS BIGINT)
           AS pass_ratio_1e6
  FROM (SELECT doc_id,
               CASE WHEN {quality_pass_sql("string_split(text, ' ')")}
                    THEN 1 ELSE 0 END AS p
        FROM documents)
  GROUP BY 1
)
"""


@query(
    "web_host_quality",
    oracle=f"WITH {_HOST_Q_CTE} SELECT host, n_pages, n_pass, pass_ratio_1e6 FROM hq",
)
def web_host_quality(spark, sf_dir):
    """Domain-level curation signal: per host, how much content passes
    the SAME document quality predicate the per-doc gate applies."""
    return weblinks.host_quality(_pages(spark, sf_dir))


@query(
    "web_quality_hosts",
    oracle=f"""
    WITH {_HOST_Q_CTE},
    tot AS (SELECT sum(n_pages) AS tp, sum(n_pass) AS ts FROM hq)
    SELECT host FROM hq, tot WHERE n_pass * tp > ts * n_pages
    """,
)
def web_quality_hosts(spark, sf_dir):
    """Above-corpus-mean hosts (scale-free integer cross-multiplication
    — the domain keep-list a C4-style pipeline feeds back into the
    crawler)."""
    return weblinks.quality_hosts(_pages(spark, sf_dir))


@query(
    "web_crawl_frontier",
    oracle=f"""
    WITH {_LINKS_CTE},
    e AS (SELECT src_host AS subj_id, dst_host AS obj_id,
                 n_links AS n_evidence FROM lg),
    {_pagerank_ctes(PAGERANK_ITERS)},
    pg AS (
      SELECT 'https://ex' || CAST(doc_id % {N_HOST_SHARDS} AS VARCHAR)
               || '.example.net/p/' || CAST(doc_id AS VARCHAR) AS url,
             'ex' || CAST(doc_id % {N_HOST_SHARDS} AS VARCHAR)
               || '.example.net' AS host,
             (SELECT n FROM nd) - 1 - doc_id AS age_sec
      FROM documents),
    scored AS (
      SELECT pg.url, pg.host, CAST(pg.age_sec AS BIGINT) AS age_sec,
             CAST(coalesce(p.pr, 0) AS BIGINT) AS pr_1e6,
             CAST((pg.age_sec + 1) * coalesce(p.pr, 0) AS BIGINT) AS priority
      FROM pg LEFT JOIN p{PAGERANK_ITERS} p ON pg.host = p.id)
    SELECT url, host, age_sec, pr_1e6, priority,
           CAST(row_number() OVER (PARTITION BY host
                                   ORDER BY priority DESC, url) AS BIGINT) AS host_rank
    FROM scored
    """,
)
def web_crawl_frontier(spark, sf_dir):
    """Re-crawl queue: (age+1) x host-PageRank priority with per-host
    politeness ranks — the oracle rebuilds age closed-form from doc_id
    and replays the same unrolled integer PageRank."""
    from hebrew_ner_spark.operators import pagerank

    pages = _pages(spark, sf_dir)
    edges = weblinks.link_edges(pages).select(
        F.col("src_host").alias("subj_id"),
        F.col("dst_host").alias("obj_id"),
        F.col("n_links").alias("n_evidence"),
    )
    pr = pagerank.entity_pagerank(edges).select(
        F.col("entity_id").alias("host"), "pr_1e6"
    )
    return weblinks.crawl_frontier(pages, pr)


# Planted naming evidence for the alias-dictionary gate: the organic
# synthetic nav cycles anchors so every (canon, anchor) pair has n = 1
# and no alias can ever reach dominance — the planted set (the
# cur_pii_redact pattern) adds
#   * 5 unambiguous aliases  alias0..alias4 (share = 100%, kept),
#   * one ambiguous alias    amb  (~50/50 over two targets, dropped),
#   * one low-support alias  weak (n = 1 < ALIAS_MIN_N, dropped),
# with identical closed-form construction on both engines.
_PLANT_PAGE_SPARK = """
CASE WHEN doc_id % 10 = 0 THEN
       concat('<a href="https://ex0.example.net/p/',
              CAST((doc_id DIV 10) % 5 AS STRING), '">alias',
              CAST((doc_id DIV 10) % 5 AS STRING), '</a>')
     WHEN doc_id % 10 = 1 THEN
       concat('<a href="https://ex0.example.net/p/',
              CASE WHEN doc_id % 20 = 1 THEN '9001' ELSE '9002' END,
              '">amb</a>')
     WHEN doc_id = 7 THEN
       '<a href="https://ex0.example.net/p/9003">weak</a>'
END
"""

_PLANT_EV_DUCK = """
ev_pl AS (
  SELECT canon, anchor_text, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT 'https://ex0.example.net/p/' || CAST((doc_id // 10) % 5 AS VARCHAR) AS canon,
           'alias' || CAST((doc_id // 10) % 5 AS VARCHAR) AS anchor_text
    FROM documents WHERE doc_id % 10 = 0
    UNION ALL
    SELECT 'https://ex0.example.net/p/' ||
             CASE WHEN doc_id % 20 = 1 THEN '9001' ELSE '9002' END,
           'amb'
    FROM documents WHERE doc_id % 10 = 1
    UNION ALL
    SELECT 'https://ex0.example.net/p/9003', 'weak'
    FROM documents WHERE doc_id = 7
  ) GROUP BY 1, 2
)
"""


@query(
    "web_alias_dict",
    oracle=f"""
    WITH {_LINKS_CTE},
    ev_org AS (
      SELECT 'https://' || dst_host || '/p/' || CAST(t AS VARCHAR) AS canon,
             ({_TERMS_SQL})[CAST((t + k) % {len(weblinks.ANCHOR_TERMS)} AS INT) + 1]
               AS anchor_text,
             CAST(count(*) AS BIGINT) AS n
      FROM cn GROUP BY 1, 2),
    {_PLANT_EV_DUCK.strip().rstrip()},
    ev AS (SELECT canon, anchor_text, CAST(sum(n) AS BIGINT) AS n
           FROM (SELECT * FROM ev_org UNION ALL SELECT * FROM ev_pl)
           GROUP BY 1, 2),
    tot AS (SELECT anchor_text, CAST(sum(n) AS BIGINT) AS n_total
            FROM ev GROUP BY anchor_text),
    top AS (SELECT canon, anchor_text, n,
                   row_number() OVER (PARTITION BY anchor_text
                                      ORDER BY n DESC, canon) AS _r
            FROM ev)
    SELECT anchor_text, canon, n, n_total,
           CAST((2 * n * 1000000 + n_total) // (2 * n_total) AS BIGINT)
             AS share_1e6
    FROM top JOIN tot USING (anchor_text)
    WHERE _r = 1 AND n >= {weblinks.ALIAS_MIN_N}
      AND (2 * n * 1000000 + n_total) // (2 * n_total)
            >= {weblinks.ALIAS_MIN_SHARE_1E6}
    """,
)
def web_alias_dict(spark, sf_dir):
    """Alias dictionary mined from anchor naming evidence over organic +
    planted pages: dominant canonical target per anchor text with
    support + dominance guards; the ambiguous and low-support plants
    must be rejected (operators/weblinks.py alias_dictionary — the
    broadcast tier the web-scale linker consumes)."""
    docs = load_table(spark, sf_dir, "documents")
    organic = weblinks.synth_linked_pages(docs)
    planted = (
        docs.select("doc_id", F.expr(_PLANT_PAGE_SPARK).alias("_a"))
        .where(F.col("_a").isNotNull())
        .select(
            F.concat(
                F.lit("https://plant.example.net/src/"),
                F.col("doc_id").cast("string"),
            ).alias("url"),
            F.expr("timestamp'2024-01-01 00:00:00'").alias("warc_ts"),
            F.encode(
                F.concat(F.lit("<html><body>"), F.col("_a"), F.lit("</body></html>")),
                "UTF-8",
            ).alias("html"),
            F.lit("").alias("text"),
            F.lit("en").alias("lang"),
        )
    )
    return weblinks.alias_dictionary(organic.unionByName(planted))


@query(
    "web_url_canon",
    oracle=r"""
    WITH ucmess AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END || '://'
             || CASE WHEN doc_id % 4 = 0 THEN 'ExAmple.ORG' ELSE 'example.org' END
             || CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END
             || '/' || lang || '/Doc/' || CAST(doc_id AS VARCHAR)
             || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
             || CASE CAST(doc_id % 3 AS INT)
                  WHEN 0 THEN '?utm_source=feed&ref=' || CAST(doc_id % 5 AS VARCHAR)
                  WHEN 1 THEN '?ref=' || CAST(doc_id % 5 AS VARCHAR)
                  ELSE '' END
             || CASE WHEN doc_id % 5 = 0 THEN '#top' ELSE '' END AS url
      FROM documents
    ),
    ucsteps AS (
      SELECT doc_id, url,
        regexp_replace(regexp_replace(regexp_replace(url, '#.*', ''),
                       '\?utm_[^&]*&', '?'), '\?utm_[^&]*$', '') AS u1
      FROM ucmess
    ),
    uclow AS (
      SELECT doc_id, url,
        CASE WHEN regexp_extract(u1, '^([a-zA-Z]+://[^/?#]*)', 1) = '' THEN u1
             ELSE lower(regexp_extract(u1, '^([a-zA-Z]+://[^/?#]*)', 1))
                  || regexp_replace(u1, '^[a-zA-Z]+://[^/?#]*', '') END AS u2
      FROM ucsteps
    )
    SELECT doc_id, url,
      regexp_replace(regexp_replace(regexp_replace(u2,
        '^(https://[^/:]+):443', '\1'), '/\?', '?'), '/$', '') AS canon
    FROM uclow
    """,
)
def web_url_canon(spark, sf_dir):
    """Crawl-dedup URL canonicalization over deterministically messy
    urls: fragment / utm / case / default-port / trailing-slash rules,
    each varying independently by doc_id residue so every rule is
    exercised (and their compositions). The oracle replays the rules in
    DuckDB's regex dialect — identical values, independent spelling."""
    return weblinks.url_canonicalize(
        weblinks.synth_messy_urls(load_table(spark, sf_dir, "documents"))
    )


_CB_B = weblinks.CRAWL_BUDGET


@query(
    "web_crawl_budget",
    oracle=f"""
    WITH {_HOST_Q_CTE},
    cbw AS (SELECT host, n_pass AS w FROM hq),
    cbt AS (SELECT sum(w) AS tw FROM cbw),
    cbb AS (SELECT host, w,
                   CAST((w * {_CB_B}) // tw AS BIGINT) AS base,
                   CAST((w * {_CB_B}) % tw AS BIGINT) AS rem
            FROM cbw, cbt),
    cbe AS (SELECT {_CB_B} - sum(base) AS extra FROM cbb),
    cbr AS (SELECT host, w, base, rem,
                   row_number() OVER (ORDER BY rem DESC, host ASC) AS rk
            FROM cbb)
    SELECT host, w, base, rem,
           CAST(base + CASE WHEN rk <= (SELECT extra FROM cbe)
                            THEN 1 ELSE 0 END AS BIGINT) AS budget
    FROM cbr
    """,
)
def web_crawl_budget(spark, sf_dir):
    """Largest-remainder (Hamilton) crawl-budget apportionment over the
    per-host quality weights (operators/weblinks.py crawl_budget):
    floors + ranked remainders, exact integers, output sums to the
    budget by construction. The oracle replays the identical
    arithmetic with DuckDB scalar subqueries — agreement gates the
    floor/mod split, the remainder tie order, and the scalar folds."""
    return weblinks.crawl_budget(_pages(spark, sf_dir))


from hebrew_ner_spark.operators import linking as linking_ops  # noqa: E402

_DS_K = linking_ops.DISAMB_CAND_K


@query(
    "link_disambiguate",
    oracle=f"""
    WITH {_LINKS_CTE},
    dsev AS (
      SELECT 'https://' || dst_host || '/p/' || CAST(t AS VARCHAR) AS canon,
             ({_TERMS_SQL})[CAST((t + k) % {len(weblinks.ANCHOR_TERMS)} AS INT) + 1]
               AS alias,
             CAST(count(*) AS BIGINT) AS n,
             dst_host AS host
      FROM cn GROUP BY 1, 2, 4),
    dsc AS (
      SELECT alias, canon, n, host FROM (
        SELECT alias, canon, n, host,
               row_number() OVER (PARTITION BY alias
                                  ORDER BY n DESC, canon) AS tr
        FROM dsev) WHERE tr <= {_DS_K}),
    dsm AS (
      SELECT DISTINCT doc_id, alias FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS alias
        FROM documents)),
    dscm AS (
      SELECT m.doc_id, m.alias, c.canon, c.n, c.host
      FROM dsm m JOIN dsc c USING (alias)),
    dshs AS (SELECT doc_id, host, sum(n) AS hsup FROM dscm GROUP BY 1, 2),
    dsr AS (
      SELECT m.doc_id, m.alias, m.canon, m.n, h.hsup,
             row_number() OVER (PARTITION BY m.doc_id, m.alias
                                ORDER BY h.hsup DESC, m.n DESC, m.canon) AS r
      FROM dscm m JOIN dshs h USING (doc_id, host))
    SELECT doc_id, alias, canon, n, CAST(hsup AS BIGINT) AS host_support
    FROM dsr WHERE r = 1
    """,
)
def link_disambiguate(spark, sf_dir):
    """Anchor-commonness + document-host-coherence disambiguation
    (operators/linking.py disambiguate_mentions): candidates trimmed to
    the top-k commonness cut per alias, then each in-document mention
    resolves to the candidate whose host carries the most candidate
    evidence within that document (ties -> commonness -> canon). The
    oracle replays the trim window, the coherence aggregate and the
    argmax — agreement gates the full two-stage cascade including both
    pinned tie orders."""
    docs = load_table(spark, sf_dir, "documents")
    cands = weblinks.anchor_evidence(weblinks.synth_linked_pages(docs))
    return linking_ops.disambiguate_mentions(docs, cands)


# ---------------------------------------------------------------------------
# rel=canonical chain resolution
# ---------------------------------------------------------------------------


@query(
    "web_canonical_resolve",
    oracle="""
    WITH RECURSIVE cn_d AS (
      SELECT 'https://site.example.org/p/' || CAST(doc_id AS VARCHAR) AS url,
             'https://site.example.org/p/' || CAST(
               CASE WHEN doc_id % 3 <> 0 THEN doc_id - doc_id % 3
                    WHEN doc_id % 30 <> 0 THEN doc_id - doc_id % 30
                    ELSE doc_id END AS VARCHAR) AS canon
      FROM documents
    ),
    cn_walk(url, cur, depth) AS (
      SELECT url, canon, CASE WHEN url = canon THEN 0 ELSE 1 END FROM cn_d
      UNION
      SELECT w.url, d.canon, w.depth + 1
      FROM cn_walk w JOIN cn_d d ON d.url = w.cur AND d.canon <> w.cur
    )
    SELECT url, cur AS canonical_url, CAST(max(depth) AS BIGINT) AS depth
    FROM cn_walk w
    WHERE NOT EXISTS (SELECT 1 FROM cn_d d
                      WHERE d.url = w.cur AND d.canon <> w.cur)
    GROUP BY url, cur
    """,
)
def web_canonical_resolve(spark, sf_dir):
    """Canonical-chain resolution to the self-declaring root with exact
    hop depth — vs a recursive-CTE walk oracle (opposite construction)."""
    return weblinks.canonical_resolve(
        weblinks.synth_canonical_decls(load_table(spark, sf_dir, "documents"))
    )


# ---------------------------------------------------------------------------
# TrustRank + spam mass (quality hosts as the trusted seed set)
# ---------------------------------------------------------------------------


def _trust_ctes(iters: int) -> str:
    """Unrolled two-vector power iterations over ``e`` with trust seeded
    at ``tseed`` ids: the _pagerank_ctes discipline with (pr, tr) side
    by side, every sum cast back to BIGINT."""
    from hebrew_ner_spark.operators.pagerank import PR_BASE, PR_DAMP_NUM, PR_SCALE

    parts = [
        "twm AS (SELECT subj_id, obj_id, CAST(sum(n_evidence) AS BIGINT) AS ew"
        " FROM e GROUP BY 1, 2)",
        "tow AS (SELECT subj_id, CAST(sum(ew) AS BIGINT) AS ow FROM twm GROUP BY 1)",
        "tnodes AS (SELECT subj_id AS id FROM twm UNION SELECT obj_id FROM twm)",
        f"""tb AS (
      SELECT n.id,
             CAST({PR_BASE} AS BIGINT) AS base_pr,
             CAST(CASE WHEN s.id IS NOT NULL THEN {PR_BASE} ELSE 0 END
                  AS BIGINT) AS base_tr,
             CAST({PR_SCALE} AS BIGINT) AS pr0,
             CAST(CASE WHEN s.id IS NOT NULL THEN {PR_SCALE} ELSE 0 END
                  AS BIGINT) AS tr0
      FROM tnodes n LEFT JOIN tseed s ON s.id = n.id
    )""",
        "t0 AS (SELECT id, pr0 AS pr, tr0 AS tr FROM tb)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"""tc{k} AS (
      SELECT twm.obj_id AS id,
             CAST(sum((p.pr * twm.ew) // tow.ow) AS BIGINT) AS sp,
             CAST(sum((p.tr * twm.ew) // tow.ow) AS BIGINT) AS st
      FROM twm JOIN tow USING (subj_id) JOIN t{k - 1} p ON p.id = twm.subj_id
      GROUP BY twm.obj_id
    )"""
        )
        parts.append(
            f"""t{k} AS (
      SELECT b.id,
             CAST(b.base_pr + ({PR_DAMP_NUM} * coalesce(c.sp, 0)) // 100
                  AS BIGINT) AS pr,
             CAST(b.base_tr + ({PR_DAMP_NUM} * coalesce(c.st, 0)) // 100
                  AS BIGINT) AS tr
      FROM tb b LEFT JOIN tc{k} c ON c.id = b.id
    )"""
        )
    return ",\n    ".join(parts)


@query(
    "web_spam_mass",
    oracle=f"""
    WITH {_LINKS_CTE},
    {_HOST_Q_CTE},
    tot AS (SELECT sum(n_pages) AS tp, sum(n_pass) AS ts FROM hq),
    tseed AS (SELECT host AS id FROM hq, tot WHERE n_pass * tp > ts * n_pages),
    e AS (SELECT src_host AS subj_id, dst_host AS obj_id,
                 n_links AS n_evidence FROM lg),
    {_trust_ctes(PAGERANK_ITERS)}
    SELECT id AS host, pr AS pr_1e6, tr AS tr_1e6,
           CAST(CASE WHEN pr <= 0 THEN 0
                ELSE (2 * greatest(pr - tr, 0) * 1000000 + pr) // (2 * pr)
                END AS BIGINT) AS spam_mass_1e6
    FROM t{PAGERANK_ITERS}
    """,
)
def web_spam_mass(spark, sf_dir):
    """TrustRank seeded at the above-mean quality hosts, next to plain
    host PageRank, plus relative spam mass — both vectors carried as two
    columns of ONE power loop (zero extra shuffles over PageRank;
    operators/pagerank.py trust_and_spam vs the same rounds unrolled as
    two-vector DuckDB CTEs)."""
    from hebrew_ner_spark.operators import pagerank

    pages = _pages(spark, sf_dir)
    edges = weblinks.link_edges(pages).select(
        F.col("src_host").alias("subj_id"),
        F.col("dst_host").alias("obj_id"),
        F.col("n_links").alias("n_evidence"),
    )
    seeds = weblinks.quality_hosts(pages)
    out = pagerank.trust_and_spam(edges, seeds)
    return out.select(
        F.col("entity_id").alias("host"), "pr_1e6", "tr_1e6", "spam_mass_1e6"
    )


# ---------------------------------------------------------------------------
# Mirror-host detection (host-grain MinHash-LSH + exact Jaccard verify)
# ---------------------------------------------------------------------------

from hebrew_ner_spark.querydefs.dedup_q import (  # noqa: E402
    _PAIRS_SQL as _MIRROR_PAIRS_SQL,
    _bands_cte as _mirror_bands_cte,
)


def _docs_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# Host-keyed (doc_id = host) page text, with a planted full mirror of the
# ex0 shard under mirror.example.net: organic inter-shard host Jaccard is
# ~0.13 at sf0.01 (below any band-collision odds), so the plant is what
# makes the LSH candidate step non-vacuous — and its Jaccard is exactly
# 1e6, while any organic candidate lands far below the 0.9 mirror bar.
_MIRROR_SRC = (
    "(SELECT 'ex' || CAST(doc_id % 4 AS VARCHAR) || '.example.net' AS doc_id,"
    " text FROM documents"
    " UNION ALL"
    " SELECT 'mirror.example.net' AS doc_id, text FROM documents"
    " WHERE doc_id % 4 = 0)"
)


@query(
    "web_mirror_hosts",
    oracle=f"""
    WITH {_mirror_bands_cte(_MIRROR_SRC)},
    mh_cand AS ({_MIRROR_PAIRS_SQL}),
    mh_sh AS (SELECT DISTINCT doc_id AS h, shingle FROM sh),
    mh_sz AS (SELECT h, CAST(count(*) AS BIGINT) AS n FROM mh_sh GROUP BY 1),
    mh_i AS (
      SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS n_inter
      FROM mh_cand c
      JOIN mh_sh a ON a.h = c.doc_a
      JOIN mh_sh b ON b.h = c.doc_b AND b.shingle = a.shingle
      GROUP BY 1, 2
    )
    SELECT i.doc_a AS host_a, i.doc_b AS host_b,
           sa.n AS n_a, sb.n AS n_b, i.n_inter,
           CAST((2 * i.n_inter * 1000000 + (sa.n + sb.n - i.n_inter))
                // (2 * (sa.n + sb.n - i.n_inter)) AS BIGINT) AS jaccard_1e6,
           CAST(CASE WHEN (2 * i.n_inter * 1000000 + (sa.n + sb.n - i.n_inter))
                          // (2 * (sa.n + sb.n - i.n_inter))
                          >= {weblinks.MIRROR_THRESHOLD_1E6}
                THEN 1 ELSE 0 END AS BIGINT) AS is_mirror
    FROM mh_i i
    JOIN mh_sz sa ON sa.h = i.doc_a
    JOIN mh_sz sb ON sb.h = i.doc_b
    """,
)
def web_mirror_hosts(spark, sf_dir):
    """Mirror-host pairs: host-grain MinHash (signatures COMPOSE — the
    host min is the min over its docs' shingle rows, so the one-pass
    signature aggregation just re-keys), LSH banding for candidates,
    exact set Jaccard verify bounded to candidates. A full mirror of
    the ex0 shard is planted under mirror.example.net
    (operators/weblinks.py mirror_host_pairs)."""
    docs = _docs_w(spark, sf_dir)
    base = docs.select(
        F.concat(
            F.lit("https://ex"),
            (F.col("doc_id") % 4).cast("string"),
            F.lit(".example.net/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        "text",
    )
    mirror = docs.where(F.col("doc_id") % 4 == 0).select(
        F.concat(
            F.lit("https://mirror.example.net/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        "text",
    )
    return weblinks.mirror_host_pairs(base.unionByName(mirror))


# ---------------------------------------------------------------------------
# Fetch plan: the crawl loop's output table (robots x authority x shard)
# ---------------------------------------------------------------------------

from hebrew_ner_spark.functions.hashing import phash_duck  # noqa: E402
from hebrew_ner_spark.operators import crawl as _crawl  # noqa: E402
from hebrew_ner_spark.operators import robots as _robots  # noqa: E402
from hebrew_ner_spark.querydefs.robots_q import _ROB_CTES  # noqa: E402

_FP_HRW = phash_duck(
    "url || '|' || CAST(s.shard AS VARCHAR)", _crawl.HRW_SEED
)


@query(
    "web_fetch_plan",
    oracle=f"""
    WITH {_ROB_CTES},
    {_LINKS_CTE},
    e AS (SELECT src_host AS subj_id, dst_host AS obj_id,
                 n_links AS n_evidence FROM lg),
    {_pagerank_ctes(PAGERANK_ITERS)},
    fp_w AS (
      SELECT url, s.shard, {_FP_HRW} AS w
      FROM robd, (SELECT unnest(range({_crawl.N_FETCH_SHARDS})) AS shard) s
    ),
    fp_a AS (
      SELECT url, shard FROM (
        SELECT url, shard,
               row_number() OVER (PARTITION BY url ORDER BY w DESC, shard DESC)
                 AS rn
        FROM fp_w) WHERE rn = 1
    )
    SELECT d.url, d.host, d.allowed,
           CAST(coalesce(p.pr, 0) AS BIGINT) AS pr_1e6,
           CAST(a.shard AS BIGINT) AS shard
    FROM robd d
    LEFT JOIN p{PAGERANK_ITERS} p ON p.id = d.host
    JOIN fp_a a ON a.url = d.url
    """,
)
def web_fetch_plan(spark, sf_dir):
    """The crawl loop's closing table — one row per frontier url with
    its REP verdict (robots longest-match), its host's fused authority
    (PageRank over the link graph), and its rendezvous fetch shard:
    what a fetcher fleet actually consumes. Three url/host-keyed joins
    over components each oracle-gated on their own; the lifecycle gate
    pins the composition."""
    docs = _docs_w(spark, sf_dir)
    dec = _robots.robots_decisions(
        _robots.synth_probe_urls(docs), _robots.synth_robots_rules(docs)
    )
    from hebrew_ner_spark.operators import pagerank as _pr

    edges = weblinks.link_edges(_pages(spark, sf_dir)).select(
        F.col("src_host").alias("subj_id"),
        F.col("dst_host").alias("obj_id"),
        F.col("n_links").alias("n_evidence"),
    )
    pr = _pr.entity_pagerank(edges).select(
        F.col("entity_id").alias("host"), "pr_1e6"
    )
    shard = _crawl.shard_assignment(dec.select("url"))
    return (
        dec.join(pr, "host", "left")
        .join(shard, "url")
        .select(
            "url",
            "host",
            "allowed",
            F.coalesce("pr_1e6", F.lit(0)).cast("long").alias("pr_1e6"),
            "shard",
        )
    )


# ---------------------------------------------------------------------------
# Link-farm detection via densest-subgraph batch peeling
# ---------------------------------------------------------------------------

from hebrew_ner_spark.operators import graphstats as _gs  # noqa: E402


def _densest_oracle(rounds: int) -> str:
    """Unrolled Bahmani epsilon=0 peel over the planted host graph:
    each round drops nodes with deg * n <= e2 (e2 = symmetrized edge
    count = 2|E|); best round by exact cross-multiplied density argmax
    (earliest round wins ties). MATERIALIZED for the kcore-oracle
    reason: each round is referenced several times."""
    fh = weblinks.FARM_HOSTS
    parts = [
        f"""hs AS (SELECT DISTINCT doc_id % {fh} AS h FROM documents),
    bg AS (
      SELECT least(h, (h * 17 + 3) % {fh}) AS a,
             greatest(h, (h * 17 + 3) % {fh}) AS b
      FROM hs WHERE h <> (h * 17 + 3) % {fh}
      UNION
      SELECT least(h, (h * 29 + 11) % {fh}), greatest(h, (h * 29 + 11) % {fh})
      FROM hs WHERE h <> (h * 29 + 11) % {fh}
    ),
    farm AS (SELECT x.h AS a, y.h AS b FROM hs x, hs y
             WHERE x.h >= {weblinks.FARM_LO} AND y.h >= {weblinks.FARM_LO}
               AND x.h < y.h),
    und AS (SELECT a, b FROM bg UNION SELECT a, b FROM farm),
    s0 AS MATERIALIZED (SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
    m0 AS MATERIALIZED (SELECT count(DISTINCT a) AS n, count(*) AS e2 FROM s0)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""
    d{i} AS MATERIALIZED (
      SELECT a FROM (SELECT a, count(*) AS c FROM s{i - 1} GROUP BY a), m{i - 1}
      WHERE c * n <= e2
    ),
    s{i} AS MATERIALIZED (
      SELECT s.a, s.b FROM s{i - 1} s
      WHERE NOT EXISTS (SELECT 1 FROM d{i} x WHERE x.a = s.a)
        AND NOT EXISTS (SELECT 1 FROM d{i} x WHERE x.a = s.b)
    ),
    m{i} AS MATERIALIZED (SELECT count(DISTINCT a) AS n, count(*) AS e2 FROM s{i}),
    p{i} AS MATERIALIZED (
      SELECT DISTINCT a AS node, CAST({i - 1} AS BIGINT) AS peel_round
      FROM s{i - 1} WHERE a NOT IN (SELECT a FROM s{i})
    )"""
        )
    rounds_union = " UNION ALL ".join(
        f"SELECT {i} AS rnd, n, e2 FROM m{i}" for i in range(rounds + 1)
    )
    peel_union = " UNION ALL ".join(
        f"SELECT node, peel_round FROM p{i}" for i in range(1, rounds + 1)
    )
    return f"""
    WITH {",".join(parts)},
    rounds AS (SELECT * FROM ({rounds_union}) WHERE n > 0),
    best AS (
      SELECT r.rnd AS b FROM rounds r
      WHERE NOT EXISTS (
        SELECT 1 FROM rounds q
        WHERE q.e2 * r.n > r.e2 * q.n
           OR (q.e2 * r.n = r.e2 * q.n AND q.rnd < r.rnd))
    ),
    peeled AS ({peel_union})
    SELECT p.node, p.peel_round,
           CAST(p.peel_round >= best.b AS BIGINT) AS in_densest
    FROM peeled p CROSS JOIN best
    """


@query("web_link_farm", oracle=_densest_oracle(_gs.DSG_ORACLE_ROUNDS))
def web_link_farm(spark, sf_dir):
    """Link-farm detection: densest-subgraph batch peel (Bahmani et al.
    2012, epsilon=0) over the planted host graph. in_densest=1 must be
    exactly the planted clique [FARM_LO, FARM_HOSTS) — pytest pins that
    recovery; the oracle unrolls the same rounds and replays the exact
    integer threshold and density argmax."""
    edges = weblinks.synth_farm_host_edges(
        load_table(spark, sf_dir, "documents")
    )
    return _gs.densest_peel(edges)
