"""Gates: degree-assortativity sufficient statistics + rich-club
curve over the planted-farm host graph. The farm clique makes both
structurally non-vacuous: the graph is degree-disassortative at the
background/farm boundary (num < 0 would break a naive truncating
division — which is exactly why the gate hashes the integer num/den
pair instead), and phi(k) must hit 10^6 (a perfect club) at the
highest thresholds where only the clique survives."""

from __future__ import annotations

from hebrew_ner_spark.operators import netstruct, weblinks
from hebrew_ner_spark.querydefs.centrality_q import _GRAPH_CTE
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table

_DEG_CTE = """
nsdeg AS (SELECT src AS v, CAST(count(*) AS BIGINT) AS deg
          FROM ctsym GROUP BY src),
nse AS (
  SELECT e.src, e.dst, a.deg AS ds, b.deg AS dd
  FROM ctsym e JOIN nsdeg a ON a.v = e.src JOIN nsdeg b ON b.v = e.dst
)
"""


@query(
    "graph_assortativity",
    oracle=f"""
    WITH {_GRAPH_CTE},
    {_DEG_CTE},
    nsm AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(ds) AS BIGINT) AS s_x,
             CAST(sum(ds * ds) AS BIGINT) AS s_xx,
             CAST(sum(ds * dd) AS BIGINT) AS s_xy
      FROM nse
    )
    SELECT m, s_x, s_xx, s_xy,
           CAST(m * s_xy - s_x * s_x AS BIGINT) AS num,
           CAST(m * s_xx - s_x * s_x AS BIGINT) AS den
    FROM nsm
    """,
)
def graph_assortativity(spark, sf_dir):
    """Exact Pearson pieces of degree assortativity (symmetrized ends
    collapse both sqrt factors to one integer)
    (operators/netstruct.py assortativity_moments)."""
    docs = load_table(spark, sf_dir, "documents")
    return netstruct.assortativity_moments(weblinks.synth_farm_host_edges(docs))


@query(
    "graph_rich_club",
    oracle=f"""
    WITH {_GRAPH_CTE},
    {_DEG_CTE},
    nsdh AS (SELECT deg, CAST(count(*) AS BIGINT) AS cnt
             FROM nsdeg GROUP BY deg),
    nseh AS (
      SELECT least(ds, dd) AS mindeg, CAST(count(*) AS BIGINT) AS ecnt
      FROM nse WHERE src < dst GROUP BY least(ds, dd)
    ),
    nsks AS (
      SELECT DISTINCT CAST(unnest(range(0, deg)) AS BIGINT) AS k FROM nsdh
    ),
    nsn AS (SELECT k, CAST(sum(cnt) AS BIGINT) AS n_gt
            FROM nsks JOIN nsdh ON deg > k GROUP BY k),
    nsee AS (SELECT k, CAST(sum(ecnt) AS BIGINT) AS e_gt
             FROM nsks JOIN nseh ON mindeg > k GROUP BY k)
    SELECT n.k, n.n_gt, CAST(coalesce(e.e_gt, 0) AS BIGINT) AS e_gt,
           CAST((2 * coalesce(e.e_gt, 0) * {netstruct.RC_SCALE})
                // (n.n_gt * (n.n_gt - 1)) AS BIGINT) AS phi_scaled
    FROM nsn n LEFT JOIN nsee e ON e.k = n.k
    WHERE n.n_gt > 1
    """,
)
def graph_rich_club(spark, sf_dir):
    """Rich-club curve from degree-histogram suffix sums — the planted
    farm must surface as phi = 10^6 at the top thresholds
    (operators/netstruct.py rich_club)."""
    docs = load_table(spark, sf_dir, "documents")
    return netstruct.rich_club(weblinks.synth_farm_host_edges(docs))
