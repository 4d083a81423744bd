"""Gates: parallel densest-subgraph peeling over the planted-farm host
graph. The oracle unrolls the full batch-peel schedule — per round:
surviving-edge restriction, one (nv, ne) stat row, the exact-integer
removal test deg * nv * 2 <= 6 * ne — so the hash certifies the entire
deterministic peel trace AND the best-density vertex set. The farm
clique (degree 7 floor inside an avg-density-~2 background) must
survive the background's collapse and be returned as the core — the
planted-structure pattern of graph_rich_club / dedup_exact. CTE names
dn-prefixed."""

from __future__ import annotations

from hebrew_ner_spark.operators import densest, weblinks
from hebrew_ner_spark.querydefs.centrality_q import _GRAPH_CTE
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table

_R = densest.DS_ROUNDS
_S = densest.DS_SCALE


def _peel_ctes() -> str:
    parts = ["dnv0 AS MATERIALIZED (SELECT DISTINCT src AS v FROM ctsym)"]
    for t in range(_R):
        parts.append(
            f"""dne{t} AS MATERIALIZED (
  SELECT a, b FROM ctund
  WHERE a IN (SELECT v FROM dnv{t}) AND b IN (SELECT v FROM dnv{t})
),
dst{t} AS MATERIALIZED (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM dnv{t}) AS nv,
         (SELECT CAST(count(*) AS BIGINT) FROM dne{t}) AS ne
),
ddg{t} AS (
  SELECT u AS v, CAST(count(*) AS BIGINT) AS deg
  FROM (SELECT a AS u FROM dne{t} UNION ALL SELECT b FROM dne{t})
  GROUP BY u
),
dnv{t + 1} AS MATERIALIZED (
  SELECT n.v
  FROM dnv{t} n LEFT JOIN ddg{t} d ON d.v = n.v CROSS JOIN dst{t} s
  WHERE coalesce(d.deg, 0) * s.nv * 2 > 6 * s.ne
)"""
        )
    return ",\n".join(parts)


_SCHED_SQL = "\nUNION ALL\n".join(
    f"""SELECT CAST({t} AS BIGINT) AS round, nv, ne,
       CAST(ne * {_S} // nv AS BIGINT) AS dens_1e6
FROM dst{t} WHERE nv > 0"""
    for t in range(_R)
)

_TAGGED_SQL = "\nUNION ALL\n".join(
    f"SELECT v, CAST({t} AS BIGINT) AS round FROM dnv{t}"
    for t in range(_R)
)


@query(
    "graph_densest_rounds",
    oracle=f"""
    WITH {_GRAPH_CTE},
    {_peel_ctes()}
    {_SCHED_SQL}
    """,
)
def graph_densest_rounds(spark, sf_dir):
    """The full Bahmani-et-al batch-peel schedule: (round, nv, ne,
    dens_1e6) until the vertex set empties (operators/densest.py
    densest_peel)."""
    docs = load_table(spark, sf_dir, "documents")
    return densest.densest_peel(weblinks.synth_farm_host_edges(docs))


@query(
    "graph_densest_core",
    oracle=f"""
    WITH {_GRAPH_CTE},
    {_peel_ctes()},
    dnsched AS ({_SCHED_SQL}),
    dnbest AS (
      SELECT round, dens_1e6 FROM dnsched
      ORDER BY dens_1e6 DESC, round ASC LIMIT 1
    ),
    dntag AS ({_TAGGED_SQL})
    SELECT t.v, b.round, b.dens_1e6
    FROM dntag t JOIN dnbest b ON t.round = b.round
    """,
)
def graph_densest_core(spark, sf_dir):
    """Charikar's 2(1+eps)-approx densest subgraph: the best-density
    round's surviving vertices — must isolate the planted farm clique
    (operators/densest.py densest_core)."""
    docs = load_table(spark, sf_dir, "documents")
    return densest.densest_core(weblinks.synth_farm_host_edges(docs))
