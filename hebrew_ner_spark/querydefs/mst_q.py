"""Gates: Borůvka minimum spanning forest + single-linkage clustering.

The MSF oracle never runs an MST algorithm: with unique weights, an
edge is in the MSF iff its weight equals the MINIMAX distance between
its endpoints (cycle/cut property), and minimax distances come from
(min, max)-semiring DOUBLING over materialized CTEs — the
kg_bounded_reach oracle class, opposite construction to the per-round
Borůvka contraction. The single-linkage oracle is a recursive-CTE
exact closure of the THRESHOLDED ORIGINAL graph — the SLINK ≡ MST
equivalence is the gated claim, with the Spark side cutting the forest
and the oracle never seeing it. CTE names mst-prefixed."""

from __future__ import annotations

from pyspark.sql import functions as F

from hebrew_ner_spark.operators import mst, weblinks
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table

_FH = weblinks.FARM_HOSTS
_FLO = weblinks.FARM_LO

_WE_CTE = f"""
msth AS (SELECT DISTINCT doc_id % {_FH} AS h FROM documents),
mstbg AS (
  SELECT least(h, (h * 17 + 3) % {_FH}) AS a,
         greatest(h, (h * 17 + 3) % {_FH}) AS b
  FROM msth WHERE h <> (h * 17 + 3) % {_FH}
  UNION
  SELECT least(h, (h * 29 + 11) % {_FH}), greatest(h, (h * 29 + 11) % {_FH})
  FROM msth WHERE h <> (h * 29 + 11) % {_FH}
),
mstfarm AS (SELECT x.h AS a, y.h AS b FROM msth x, msth y
            WHERE x.h >= {_FLO} AND y.h >= {_FLO} AND x.h < y.h),
mstund AS (SELECT a, b FROM mstbg UNION SELECT a, b FROM mstfarm),
mstwe AS (
  SELECT a, b,
         CAST((a * 37 + b * 53) % 97 + 1 AS BIGINT) AS wb,
         CAST(((a * 37 + b * 53) % 97 + 1) * {_FH * _FH} + a * {_FH} + b
              AS BIGINT) AS wu
  FROM mstund
)
"""

# (min, max)-semiring doubling: 6 levels cover paths of 2^6 = 64 >= |V|
# edges; identity rows (h, h, 0) make each level subsume the previous.
_MM_LEVELS = 6


def _minimax_ctes() -> str:
    parts = [
        f"""mm0 AS MATERIALIZED (
      SELECT a, b, wu AS d FROM mstwe
      UNION ALL SELECT b, a, wu FROM mstwe
      UNION ALL SELECT h, h, CAST(0 AS BIGINT) FROM msth
    )"""
    ]
    for i in range(1, _MM_LEVELS + 1):
        parts.append(
            f"""mm{i} AS MATERIALIZED (
      SELECT p.a, q.b, min(greatest(p.d, q.d)) AS d
      FROM mm{i - 1} p JOIN mm{i - 1} q ON p.b = q.a
      GROUP BY p.a, q.b
    )"""
        )
    return ",\n".join(parts)


@query(
    "web_host_msf",
    oracle=f"""
    WITH {_WE_CTE},
    {_minimax_ctes()}
    SELECT e.a, e.b, e.wu
    FROM mstwe e JOIN mm{_MM_LEVELS} m ON e.a = m.a AND e.b = m.b
    WHERE m.d = e.wu
    """,
)
def web_host_msf(spark, sf_dir):
    """Borůvka minimum spanning forest of the weighted host graph vs
    the minimax-distance characterization (two opposite algorithms:
    per-component contraction rounds vs semiring doubling)
    (operators/mst.py boruvka_msf)."""
    docs = load_table(spark, sf_dir, "documents")
    return mst.boruvka_msf(mst.weighted_host_edges(docs))


@query(
    "cc_single_linkage",
    oracle=f"""
    WITH RECURSIVE {_WE_CTE},
    mstke AS (SELECT a, b FROM mstwe WHERE wb <= {mst.SL_TAU}),
    mstsym AS (SELECT a, b FROM mstke UNION SELECT b, a FROM mstke),
    mstreach(v, u) AS (
      SELECT h, h FROM msth
      UNION
      SELECT r.v, s.b FROM mstreach r JOIN mstsym s ON r.u = s.a
    )
    SELECT CAST(v AS BIGINT) AS vertex, CAST(min(u) AS BIGINT) AS cluster
    FROM mstreach GROUP BY v
    """,
)
def cc_single_linkage(spark, sf_dir):
    """Single-linkage clusters at wb <= SL_TAU computed by CUTTING THE
    FOREST (msf edges above threshold drop, components of the rest) —
    the oracle closes over the thresholded ORIGINAL graph instead, so
    the driver row certifies the SLINK ≡ MST equivalence end to end
    (operators/mst.py single_linkage_clusters)."""
    docs = load_table(spark, sf_dir, "documents")
    we = mst.weighted_host_edges(docs)
    msf = mst.boruvka_msf(we)
    return mst.single_linkage_clusters(
        we, msf, F.expr(f"wu DIV {_FH * _FH} <= {mst.SL_TAU}")
    )
