"""Gates: deterministic synchronous Louvain phase-1 over the
planted-farm host graph. The oracle unrolls all 12 parity rounds —
per round: community strengths, (vertex, neighbor-community) weights,
the exact-integer gain ordering with stay-wins-ties, and the
parity-masked adoption — then scores the final partition's modularity
pieces with the graph_modularity arithmetic. The farm clique must
coalesce (one community holding all 8 farm hosts). CTE names
lv-prefixed."""

from __future__ import annotations

from hebrew_ner_spark.operators import louvain, weblinks
from hebrew_ner_spark.querydefs.centrality_q import _GRAPH_CTE
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table

_R = louvain.LV_ROUNDS

_BASE = """
lvk AS (SELECT src AS v, CAST(count(*) AS BIGINT) AS k FROM ctsym GROUP BY src),
lvm AS (SELECT CAST(count(*) AS BIGINT) AS m2 FROM ctsym),
lv0 AS (SELECT v, CAST(v AS BIGINT) AS comm FROM lvk)
"""


def _round_ctes() -> str:
    parts = []
    for t in range(_R):
        parts.append(
            f"""lvst{t} AS (
  SELECT s.comm, CAST(sum(k.k) AS BIGINT) AS stot
  FROM lv{t} s JOIN lvk k USING (v) GROUP BY s.comm
),
lvkc{t} AS (
  SELECT e.src AS v, s.comm AS cand, CAST(count(*) AS BIGINT) AS kic
  FROM ctsym e JOIN lv{t} s ON s.v = e.dst GROUP BY e.src, s.comm
),
lvpr{t} AS (
  SELECT v, cand FROM lvkc{t} UNION SELECT v, comm FROM lv{t}
),
lvsc{t} AS (
  SELECT p.v, p.cand,
         CASE WHEN p.cand = cur.comm THEN 1 ELSE 0 END AS is_cur,
         CASE WHEN p.cand = cur.comm
              THEN m.m2 * coalesce(kc.kic, 0) - k.k * (st.stot - k.k)
              ELSE m.m2 * coalesce(kc.kic, 0) - k.k * st.stot END AS val
  FROM lvpr{t} p
  LEFT JOIN lvkc{t} kc ON kc.v = p.v AND kc.cand = p.cand
  JOIN lv{t} cur ON cur.v = p.v
  JOIN lvk k ON k.v = p.v
  JOIN lvst{t} st ON st.comm = p.cand
  CROSS JOIN lvm m
),
lvb{t} AS (
  SELECT v, cand AS newcomm FROM (
    SELECT v, cand,
           row_number() OVER (PARTITION BY v
                              ORDER BY val DESC, is_cur DESC, cand ASC) AS rn
    FROM lvsc{t}) WHERE rn = 1
),
lv{t + 1} AS MATERIALIZED (
  SELECT cur.v,
         CAST(CASE WHEN cur.v % 2 = {t % 2} THEN b.newcomm
                   ELSE cur.comm END AS BIGINT) AS comm
  FROM lv{t} cur LEFT JOIN lvb{t} b ON b.v = cur.v
)"""
        )
    return ",\n".join(parts)


@query(
    "graph_louvain",
    oracle=f"""
    WITH {_GRAPH_CTE},
    {_BASE},
    {_round_ctes()}
    SELECT v, comm FROM lv{_R}
    """,
)
def graph_louvain(spark, sf_dir):
    """The phase-1 partition after the 12-round synchronous parity
    schedule (operators/louvain.py louvain_phase1)."""
    docs = load_table(spark, sf_dir, "documents")
    return louvain.louvain_phase1(weblinks.synth_farm_host_edges(docs))


@query(
    "graph_louvain_q",
    oracle=f"""
    WITH {_GRAPH_CTE},
    {_BASE},
    {_round_ctes()},
    lvw AS (SELECT CAST(count(*) AS BIGINT) AS w FROM ctund),
    lvwin AS (
      SELECT la.comm AS community, CAST(count(*) AS BIGINT) AS w_in
      FROM ctund e
      JOIN lv{_R} la ON la.v = e.a
      JOIN lv{_R} lb ON lb.v = e.b
      WHERE la.comm = lb.comm GROUP BY la.comm
    ),
    lvsc AS (
      SELECT s.comm AS community, CAST(count(*) AS BIGINT) AS n_v,
             CAST(sum(k.k) AS BIGINT) AS s_tot
      FROM lv{_R} s JOIN lvk k USING (v) GROUP BY s.comm
    )
    SELECT c.community, c.n_v,
           CAST(coalesce(wi.w_in, 0) AS BIGINT) AS w_in, c.s_tot,
           CAST(4 * w.w * coalesce(wi.w_in, 0) - c.s_tot * c.s_tot AS BIGINT)
             AS q_num,
           CAST(4 * w.w * w.w AS BIGINT) AS q_den
    FROM lvsc c LEFT JOIN lvwin wi ON wi.community = c.community
    CROSS JOIN lvw w
    """,
)
def graph_louvain_q(spark, sf_dir):
    """Exact modularity pieces of the final phase-1 partition through
    the gated netstruct.modularity_pieces arithmetic
    (operators/louvain.py louvain_modularity)."""
    docs = load_table(spark, sf_dir, "documents")
    return louvain.louvain_modularity(weblinks.synth_farm_host_edges(docs))
