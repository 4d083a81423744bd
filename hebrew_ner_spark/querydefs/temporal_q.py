"""Gate: time-respecting earliest-arrival over the temporal host
graph, seeded at host 0. Structurally non-vacuous at every sf: all 64
hosts are STATICALLY reachable but only a fraction temporally (the
gate graph blocks 54 of 63 journeys at sf0.01) — the disagreement
columns are the point. The oracle unrolls both relaxations (timed and
zero-timed) as materialized CTE rounds with the same INF sentinel."""

from __future__ import annotations

from hebrew_ner_spark.operators import temporal, weblinks
from hebrew_ner_spark.querydefs.centrality_q import _GRAPH_CTE
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table

_INF = temporal.EA_INF
_R = temporal.EA_ROUNDS
_SEED = 0

_TE_CTE = f"""
tme AS (
  SELECT src, dst,
         CAST((src * {temporal.T_MUL_S} + dst * {temporal.T_MUL_D})
              % {temporal.T_MOD} AS BIGINT) AS t
  FROM ctsym
)
"""


def _ea_ctes(prefix: str, t_expr: str) -> str:
    parts = [
        f"""{prefix}0 AS MATERIALIZED (
  SELECT h AS v,
         CAST(CASE WHEN h = {_SEED} THEN 0 ELSE {_INF} END AS BIGINT) AS ea
  FROM cth
)"""
    ]
    for i in range(1, _R + 1):
        parts.append(
            f"""{prefix}{i} AS MATERIALIZED (
  SELECT c.v, CAST(least(c.ea, coalesce(m.cand, c.ea)) AS BIGINT) AS ea
  FROM {prefix}{i - 1} c LEFT JOIN (
    SELECT e.dst AS v, min({t_expr}) AS cand
    FROM tme e JOIN {prefix}{i - 1} p ON p.v = e.src
    WHERE {t_expr} >= p.ea
    GROUP BY e.dst
  ) m ON m.v = c.v
)"""
        )
    return ",\n".join(parts)


@query(
    "kg_temporal_reach",
    oracle=f"""
    WITH {_GRAPH_CTE},
    {_TE_CTE},
    {_ea_ctes('tea', 'e.t')},
    {_ea_ctes('tst', 'CAST(0 AS BIGINT)')}
    SELECT a.v AS vertex, a.ea AS earliest_arrival,
           CAST(CASE WHEN s.ea < {_INF} THEN 1 ELSE 0 END AS BIGINT)
             AS static_reachable,
           CAST(CASE WHEN a.ea < {_INF} THEN 1 ELSE 0 END AS BIGINT)
             AS temporal_reachable
    FROM tea{_R} a JOIN tst{_R} s ON s.v = a.v
    """,
)
def kg_temporal_reach(spark, sf_dir):
    """Journey-semantics earliest arrival vs static closure from host 0
    — time-nondecreasing paths only; the static/temporal disagreement
    is the gated signal (operators/temporal.py earliest_arrival)."""
    docs = load_table(spark, sf_dir, "documents")
    und = weblinks.synth_farm_host_edges(docs)
    tedges = temporal.temporal_host_edges(und)
    seeds = spark.createDataFrame([(_SEED,)], ["v"])
    return temporal.earliest_arrival(tedges, seeds)
