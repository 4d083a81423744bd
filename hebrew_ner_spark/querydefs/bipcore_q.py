"""Gate: bipartite (i, j)-core trawling over the mutual-citation host
graph. The planted farm (a directed clique of 8) is the (4, 4)-core's
unique survivor — background hosts carry directed degree <= 4 and must
peel away exactly. The oracle unrolls the alternating hub/authority
peel as materialized CTEs (8 rounds; the gate converges in 4 and the
peel is idempotent past fixpoint)."""

from __future__ import annotations

from hebrew_ner_spark.operators import bipcore, weblinks
from hebrew_ner_spark.querydefs.centrality_q import _GRAPH_CTE
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table

_I, _J, _R = bipcore.BIP_I, bipcore.BIP_J, bipcore.BIP_MAX_ROUNDS


def _peel_ctes() -> str:
    parts = [
        """bcv AS (SELECT h AS v FROM cth),
bch0 AS MATERIALIZED (SELECT v FROM bcv),
bca0 AS MATERIALIZED (SELECT v FROM bcv)"""
    ]
    for k in range(1, _R + 1):
        parts.append(
            f"""bch{k} AS MATERIALIZED (
  SELECT e.src AS v FROM ctsym e
  JOIN bch{k - 1} h ON h.v = e.src
  JOIN bca{k - 1} a ON a.v = e.dst
  GROUP BY e.src HAVING count(*) >= {_J}
),
bca{k} AS MATERIALIZED (
  SELECT e.dst AS v FROM ctsym e
  JOIN bch{k} h ON h.v = e.src
  JOIN bca{k - 1} a ON a.v = e.dst
  GROUP BY e.dst HAVING count(*) >= {_I}
)"""
        )
    return ",\n".join(parts)


@query(
    "web_trawling_core",
    oracle=f"""
    WITH {_GRAPH_CTE},
    {_peel_ctes()}
    SELECT bcv.v AS vertex,
           CAST(CASE WHEN h.v IS NULL THEN 0 ELSE 1 END AS BIGINT) AS as_hub,
           CAST(CASE WHEN a.v IS NULL THEN 0 ELSE 1 END AS BIGINT) AS as_auth
    FROM bcv
    LEFT JOIN bch{_R} h ON h.v = bcv.v
    LEFT JOIN bca{_R} a ON a.v = bcv.v
    """,
)
def web_trawling_core(spark, sf_dir):
    """(4, 4)-core of the mutual-citation host graph: the alternating
    hub/authority peel must recover the planted farm exactly
    (operators/bipcore.py bipartite_core)."""
    docs = load_table(spark, sf_dir, "documents")
    return bipcore.bipartite_core(
        bipcore.directed_host_edges(weblinks.synth_farm_host_edges(docs))
    )
