"""Gates: Luby MIS + Jones-Plassmann coloring over the planted-farm
host graph, priorities fixed (p = (v*37+11) % 97, injective on the
64-host universe). Both oracles unroll the operator's rounds as
materialized CTEs — active/uncolored sets shrink via EXCEPT, entrants
are local priority minima, colors come from a 0..MAXC series with a
correlated NOT EXISTS against colored neighbors — so the gates verify
the full round-by-round schedule, not just the final fixpoint."""

from __future__ import annotations

from hebrew_ner_spark.operators import symbreak, weblinks
from hebrew_ner_spark.querydefs.centrality_q import _GRAPH_CTE
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table

_PM, _PA, _PQ = symbreak.PRIO_MUL, symbreak.PRIO_ADD, symbreak.PRIO_MOD


def _mis_ctes(rounds: int) -> str:
    parts = [
        f"""act0 AS MATERIALIZED (
  SELECT h AS v, CAST((h * {_PM} + {_PA}) % {_PQ} AS BIGINT) AS p FROM cth
),
mis0 AS MATERIALIZED (SELECT CAST(NULL AS BIGINT) AS v WHERE FALSE)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""nm{i} AS MATERIALIZED (
  SELECT e.src AS v, min(u2.p) AS nmin
  FROM ctsym e
  JOIN act{i - 1} u1 ON u1.v = e.src
  JOIN act{i - 1} u2 ON u2.v = e.dst
  GROUP BY e.src
),
ent{i} AS MATERIALIZED (
  SELECT a.v FROM act{i - 1} a LEFT JOIN nm{i} m ON m.v = a.v
  WHERE m.nmin IS NULL OR a.p < m.nmin
),
mis{i} AS MATERIALIZED (
  SELECT v FROM mis{i - 1} UNION ALL SELECT v FROM ent{i}
),
act{i} AS MATERIALIZED (
  SELECT a.v, a.p FROM act{i - 1} a
  WHERE a.v NOT IN (SELECT v FROM ent{i})
    AND a.v NOT IN (SELECT e.dst FROM ctsym e JOIN ent{i} x ON x.v = e.src)
)"""
        )
    return ",\n".join(parts)


@query(
    "graph_mis_luby",
    oracle=f"""
    WITH {_GRAPH_CTE},
    {_mis_ctes(symbreak.MIS_MAX_ROUNDS)}
    SELECT cth.h AS vertex,
           CAST(CASE WHEN m.v IS NULL THEN 0 ELSE 1 END AS BIGINT) AS in_mis
    FROM cth LEFT JOIN mis{symbreak.MIS_MAX_ROUNDS} m ON m.v = cth.h
    """,
)
def graph_mis_luby(spark, sf_dir):
    """Greedy-by-priority maximal independent set, rounds unrolled on
    both engines (operators/symbreak.py luby_mis)."""
    docs = load_table(spark, sf_dir, "documents")
    return symbreak.luby_mis(weblinks.synth_farm_host_edges(docs))


def _jp_ctes(rounds: int, max_color: int) -> str:
    parts = [
        f"""unc0 AS MATERIALIZED (
  SELECT h AS v, CAST((h * {_PM} + {_PA}) % {_PQ} AS BIGINT) AS p FROM cth
),
col0 AS MATERIALIZED (
  SELECT CAST(NULL AS BIGINT) AS vertex, CAST(NULL AS BIGINT) AS color
  WHERE FALSE
),
cser AS (SELECT CAST(unnest(range(0, {max_color + 1})) AS BIGINT) AS c)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""jnm{i} AS MATERIALIZED (
  SELECT e.src AS v, min(u2.p) AS nmin
  FROM ctsym e
  JOIN unc{i - 1} u1 ON u1.v = e.src
  JOIN unc{i - 1} u2 ON u2.v = e.dst
  GROUP BY e.src
),
rdy{i} AS MATERIALIZED (
  SELECT u.v FROM unc{i - 1} u LEFT JOIN jnm{i} m ON m.v = u.v
  WHERE m.nmin IS NULL OR u.p < m.nmin
),
new{i} AS MATERIALIZED (
  SELECT r.v AS vertex, min(s.c) AS color
  FROM rdy{i} r CROSS JOIN cser s
  WHERE NOT EXISTS (
    SELECT 1 FROM ctsym e JOIN col{i - 1} nb ON nb.vertex = e.dst
    WHERE e.src = r.v AND nb.color = s.c
  )
  GROUP BY r.v
),
col{i} AS MATERIALIZED (
  SELECT vertex, color FROM col{i - 1}
  UNION ALL SELECT vertex, color FROM new{i}
),
unc{i} AS MATERIALIZED (
  SELECT u.v, u.p FROM unc{i - 1} u
  WHERE u.v NOT IN (SELECT vertex FROM new{i})
)"""
        )
    return ",\n".join(parts)


@query(
    "graph_coloring_jp",
    oracle=f"""
    WITH {_GRAPH_CTE},
    {_jp_ctes(symbreak.JP_MAX_ROUNDS, symbreak.JP_MAX_COLOR)}
    SELECT vertex, CAST(color AS BIGINT) AS color
    FROM col{symbreak.JP_MAX_ROUNDS}
    """,
)
def graph_coloring_jp(spark, sf_dir):
    """Greedy-by-priority proper coloring (smallest free color per
    committed local minimum), rounds unrolled on both engines
    (operators/symbreak.py jp_coloring)."""
    docs = load_table(spark, sf_dir, "documents")
    return symbreak.jp_coloring(weblinks.synth_farm_host_edges(docs))
