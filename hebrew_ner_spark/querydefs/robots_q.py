"""Gates for robots.txt politeness (operators/robots.py).

Oracles reconstruct rules, probes, and REP verdicts CLOSED-FORM from
``documents`` (synthesis is a pure function of doc_id) — the oracle
resolves longest-match precedence with a ranked window while Spark uses
a partial-aggregating max(struct); two independent routes to the same
verdicts. CTE names are rob-prefixed. Flags are BIGINT (contract)."""

from __future__ import annotations

from hebrew_ner_spark.operators import robots
from hebrew_ner_spark.operators.weblinks import N_HOST_SHARDS
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table

# Closed-form probes + rules. Paths: organic /p/<id> for every doc,
# /q/<id> probes at doc_id % Q == 0, /private/x<id> at doc_id % P == 0.
_ROB_CTES = f"""
robs AS (SELECT DISTINCT doc_id % {N_HOST_SHARDS} AS s FROM documents),
robr AS (
  SELECT s, '/private/' AS prefix, 0 AS rule_allow FROM robs
  UNION ALL SELECT s, '/q/', 0 FROM robs
  UNION ALL SELECT s, '/q/', 1 FROM robs
  UNION ALL SELECT s, '/p/', 0 FROM robs WHERE s % 2 = 0
  UNION ALL SELECT s, '/p/1', 1 FROM robs WHERE s % 2 = 0
  UNION ALL SELECT s, '/p/12', 0 FROM robs WHERE s % 2 = 0
),
robu AS (
  SELECT doc_id % {N_HOST_SHARDS} AS s,
         'ex' || CAST(doc_id % {N_HOST_SHARDS} AS VARCHAR)
           || '.example.net' AS host,
         '/p/' || CAST(doc_id AS VARCHAR) AS path
  FROM documents
  UNION ALL
  SELECT doc_id % {N_HOST_SHARDS},
         'ex' || CAST(doc_id % {N_HOST_SHARDS} AS VARCHAR) || '.example.net',
         '/q/' || CAST(doc_id AS VARCHAR)
  FROM documents WHERE doc_id % {robots.Q_PROBE_MOD} = 0
  UNION ALL
  SELECT doc_id % {N_HOST_SHARDS},
         'ex' || CAST(doc_id % {N_HOST_SHARDS} AS VARCHAR) || '.example.net',
         '/private/x' || CAST(doc_id AS VARCHAR)
  FROM documents WHERE doc_id % {robots.PRIVATE_PROBE_MOD} = 0
),
robm AS (
  SELECT u.path, u.s, r.rule_allow, length(r.prefix) AS plen,
         row_number() OVER (
           PARTITION BY u.path, u.s
           ORDER BY length(r.prefix) DESC, r.rule_allow DESC) AS rn
  FROM robu u JOIN robr r ON u.s = r.s AND starts_with(u.path, r.prefix)
),
robd AS (
  SELECT 'https://' || u.host || u.path AS url, u.host,
         CAST(coalesce(m.rule_allow, 1) AS BIGINT) AS allowed,
         CAST(coalesce(m.plen, 0) AS BIGINT) AS rule_len
  FROM robu u
  LEFT JOIN (SELECT * FROM robm WHERE rn = 1) m
    ON u.path = m.path AND u.s = m.s
)
"""


def _decisions(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return robots.robots_decisions(
        robots.synth_probe_urls(docs), robots.synth_robots_rules(docs)
    )


@query(
    "web_robots_decisions",
    oracle=f"""
    WITH {_ROB_CTES}
    SELECT url, host, allowed, rule_len FROM robd
    """,
)
def web_robots_decisions(spark, sf_dir):
    """REP verdict per frontier url: longest-match allow/deny with the
    Allow-wins tie rule and default-allow — one broadcast rule join +
    one max(struct) aggregate, frontier read once."""
    return _decisions(spark, sf_dir)


@query(
    "web_robots_blocked_share",
    oracle=f"""
    WITH {_ROB_CTES}
    SELECT host, CAST(count(*) AS BIGINT) AS n_urls,
           CAST(sum(1 - allowed) AS BIGINT) AS n_blocked,
           CAST((2 * 1000000 * sum(1 - allowed) + count(*))
                // (2 * count(*)) AS BIGINT) AS blocked_share_1e6
    FROM robd GROUP BY host
    """,
)
def web_robots_blocked_share(spark, sf_dir):
    """Per-host deny rate in exact micro-units — the politeness
    dashboard a crawl operator reads before re-budgeting a host."""
    return robots.host_blocked_share(_decisions(spark, sf_dir))
