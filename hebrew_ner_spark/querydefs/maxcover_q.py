"""Gate: descending-thresholds greedy max coverage over the
entity->document set system. The oracle unrolls the full tau sweep —
per round: marginal gains against round-start coverage (anti-joins as
NOT IN), tau_t = tau0 // 2^t, batch admission ranked (gain desc,
entity asc) capped to the remaining budget — so the hash certifies
the entire deterministic selection schedule, not just the final set.
Entity terms heavily overlap on this corpus (each covers ~2/3 of
docs), so later picks clear far lower thresholds than tau0 — the
descending sweep is structurally exercised, not a single-round
formality."""

from __future__ import annotations

from hebrew_ner_spark.operators import maxcover
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.resources import ENTITY_TERMS
from hebrew_ner_spark.sources.catalog import load_table

_K = maxcover.MC_K
_R = maxcover.MC_ROUNDS
_TERMS = ", ".join(f"'{t}'" for t in ENTITY_TERMS)

_SETS_CTE = f"""
mcm AS (
  SELECT DISTINCT doc_id, token AS entity
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents)
  WHERE token IN ({_TERMS})
),
mct0 AS (
  SELECT CAST(max(c) AS BIGINT) AS tau0
  FROM (SELECT count(*) AS c FROM mcm GROUP BY entity)
)
"""


def _greedy_ctes() -> str:
    parts = [
        """mccov0 AS MATERIALIZED (SELECT CAST(NULL AS BIGINT) AS doc_id WHERE FALSE),
mcp0 AS MATERIALIZED (
  SELECT CAST(NULL AS BIGINT) AS pick_rank, CAST(NULL AS VARCHAR) AS entity,
         CAST(NULL AS BIGINT) AS gain, CAST(NULL AS BIGINT) AS tau
  WHERE FALSE
)"""
    ]
    for t in range(_R):
        i = t + 1
        parts.append(
            f"""mcg{i} AS MATERIALIZED (
  SELECT m.entity, CAST(count(*) AS BIGINT) AS gain
  FROM mcm m
  WHERE m.doc_id NOT IN (SELECT doc_id FROM mccov{t})
    AND m.entity NOT IN (SELECT entity FROM mcp{t})
  GROUP BY m.entity
),
mcc{i} AS MATERIALIZED (
  SELECT np + rn AS pick_rank, entity, gain, tau
  FROM (
    SELECT g.entity, g.gain,
           CAST(t.tau0 // {2 ** t} AS BIGINT) AS tau,
           (SELECT count(*) FROM mcp{t}) AS np,
           row_number() OVER (ORDER BY g.gain DESC, g.entity ASC) AS rn
    FROM mcg{i} g CROSS JOIN mct0 t
    WHERE t.tau0 // {2 ** t} >= 1 AND g.gain >= t.tau0 // {2 ** t}
  )
  WHERE np < {_K} AND np + rn <= {_K}
),
mcp{i} AS MATERIALIZED (
  SELECT * FROM mcp{t} UNION ALL SELECT * FROM mcc{i}
),
mccov{i} AS MATERIALIZED (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id FROM mccov{t}
    UNION ALL
    SELECT m.doc_id FROM mcm m JOIN mcc{i} c ON c.entity = m.entity
  )
)"""
        )
    return ",\n".join(parts)


@query(
    "kg_seed_cover",
    oracle=f"""
    WITH {_SETS_CTE},
    {_greedy_ctes()}
    SELECT pick_rank, entity, gain, tau FROM mcp{_R}
    """,
)
def kg_seed_cover(spark, sf_dir):
    """K=6 coverage seeds by descending-thresholds greedy — the full
    deterministic admission schedule (rank, gain, tau per pick) is the
    gated value (operators/maxcover.py threshold_greedy_cover)."""
    docs = load_table(spark, sf_dir, "documents")
    return maxcover.threshold_greedy_cover(maxcover.entity_doc_sets(docs))
