"""Gate: CPM schedule (ASAP/ALAP/slack/critical set) over the
order-oriented host DAG. The oracle unrolls both fixpoints as
materialized CTE rounds (16 each — the gate DAG's longest chain is
12) with the identical max-plus / min-plus relaxation steps; all
BIGINT, hash-exact."""

from __future__ import annotations

from hebrew_ner_spark.operators import cpm, weblinks
from hebrew_ner_spark.querydefs.centrality_q import _GRAPH_CTE
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table

_R = cpm.CPM_ROUNDS


def _cpm_ctes() -> str:
    parts = [
        f"""ctdag AS (SELECT a AS src, b AS dst FROM ctund),
ctdur AS (
  SELECT h AS v,
         CAST((h * {cpm.DUR_MUL} + {cpm.DUR_ADD}) % {cpm.DUR_MOD}
              + {cpm.DUR_MIN} AS BIGINT) AS dur
  FROM cth
),
cas0 AS MATERIALIZED (SELECT v, CAST(0 AS BIGINT) AS t FROM ctdur)"""
    ]
    for i in range(1, _R + 1):
        parts.append(
            f"""cas{i} AS MATERIALIZED (
  SELECT c.v, CAST(greatest(c.t, coalesce(m.cand, c.t)) AS BIGINT) AS t
  FROM cas{i - 1} c LEFT JOIN (
    SELECT e.dst AS v, max(p.t + d.dur) AS cand
    FROM ctdag e JOIN cas{i - 1} p ON p.v = e.src
    JOIN ctdur d ON d.v = e.src
    GROUP BY e.dst
  ) m ON m.v = c.v
)"""
        )
    parts.append(
        f"""cmk AS (SELECT max(a.t + d.dur) AS mk
        FROM cas{_R} a JOIN ctdur d ON d.v = a.v),
cls0 AS MATERIALIZED (
  SELECT d.v, CAST(mk - d.dur AS BIGINT) AS t FROM ctdur d CROSS JOIN cmk
)"""
    )
    for i in range(1, _R + 1):
        parts.append(
            f"""cls{i} AS MATERIALIZED (
  SELECT c.v, CAST(least(c.t, coalesce(m.cand - d.dur, c.t)) AS BIGINT) AS t
  FROM cls{i - 1} c JOIN ctdur d ON d.v = c.v
  LEFT JOIN (
    SELECT e.src AS v, min(p.t) AS cand
    FROM ctdag e JOIN cls{i - 1} p ON p.v = e.dst
    GROUP BY e.src
  ) m ON m.v = c.v
)"""
        )
    return ",\n".join(parts)


@query(
    "dag_cpm_schedule",
    oracle=f"""
    WITH {_GRAPH_CTE},
    {_cpm_ctes()}
    SELECT d.v AS vertex, d.dur, a.t AS asap, l.t AS ls,
           CAST(l.t - a.t AS BIGINT) AS slack,
           CAST(CASE WHEN l.t = a.t THEN 1 ELSE 0 END AS BIGINT) AS critical
    FROM ctdur d
    JOIN cas{_R} a ON a.v = d.v
    JOIN cls{_R} l ON l.v = d.v
    """,
)
def dag_cpm_schedule(spark, sf_dir):
    """Earliest/latest starts, slack and the critical set of the
    order-oriented host DAG, both fixpoints relaxed under a probed
    round budget (operators/cpm.py cpm_schedule)."""
    docs = load_table(spark, sf_dir, "documents")
    return cpm.cpm_schedule(weblinks.synth_farm_host_edges(docs))
