"""Gates: truncated Katz index + exact-integer betweenness centrality
over the planted-farm host graph (weblinks.synth_farm_host_edges: two
affine-map background neighbors per host + a clique on the farm
hosts — diameter 6, so the BFS budget of 8 levels is slack, not
tight). Both oracles unroll the iterations as materialized CTEs:
Katz as K walk-count rounds folded Horner-style, betweenness as BFS
levels with an anti-join visited set, then the sigma-product pair
identity with the same truncating integer division. All BIGINT —
the gates are hash-exact with zero float tolerance."""

from __future__ import annotations

from hebrew_ner_spark.operators import centrality, weblinks
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table

_FH = weblinks.FARM_HOSTS
_FLO = weblinks.FARM_LO

# the undirected (a, b) farm host graph, then symmetrized (src, dst)
_GRAPH_CTE = f"""
cth AS (SELECT DISTINCT doc_id % {_FH} AS h FROM documents),
ctbg AS (
  SELECT least(h, (h * 17 + 3) % {_FH}) AS a,
         greatest(h, (h * 17 + 3) % {_FH}) AS b
  FROM cth WHERE h <> (h * 17 + 3) % {_FH}
  UNION
  SELECT least(h, (h * 29 + 11) % {_FH}), greatest(h, (h * 29 + 11) % {_FH})
  FROM cth WHERE h <> (h * 29 + 11) % {_FH}
),
ctfarm AS (SELECT x.h AS a, y.h AS b FROM cth x, cth y
           WHERE x.h >= {_FLO} AND y.h >= {_FLO} AND x.h < y.h),
ctund AS (SELECT a, b FROM ctbg UNION SELECT a, b FROM ctfarm),
ctsym AS (SELECT a AS src, b AS dst FROM ctund
          UNION ALL SELECT b, a FROM ctund)
"""

_K = centrality.KATZ_ITERS
_AD = centrality.KATZ_ALPHA_DEN


def _katz_ctes() -> str:
    parts = [
        "kw0 AS MATERIALIZED (SELECT h AS v, CAST(1 AS BIGINT) AS w FROM cth)"
    ]
    for i in range(1, _K + 1):
        parts.append(
            f"""kw{i} AS MATERIALIZED (
  SELECT e.dst AS v, CAST(sum(p.w) AS BIGINT) AS w
  FROM ctsym e JOIN kw{i - 1} p ON p.v = e.src GROUP BY e.dst
)"""
        )
    return ",\n".join(parts)


# Horner fold: acc = sum_{k=1..K} AD^(K-k) * walks_k, missing rounds -> 0
_KATZ_SUM = " + ".join(
    f"{_AD ** (_K - k)} * coalesce(kw{k}.w, 0)" for k in range(1, _K + 1)
)
_KATZ_JOINS = "\n".join(
    f"LEFT JOIN kw{k} ON kw{k}.v = cth.h" for k in range(1, _K + 1)
)


@query(
    "cent_katz",
    oracle=f"""
    WITH {_GRAPH_CTE},
    {_katz_ctes()}
    SELECT cth.h AS vertex, CAST({_KATZ_SUM} AS BIGINT) AS katz_scaled
    FROM cth
    {_KATZ_JOINS}
    """,
)
def cent_katz(spark, sf_dir):
    """Truncated Katz index (alpha = 1/8, 6 rounds) in exact scaled
    integers vs the unrolled walk-count recurrence
    (operators/centrality.py katz_scaled)."""
    docs = load_table(spark, sf_dir, "documents")
    return centrality.katz_scaled(weblinks.synth_farm_host_edges(docs))


_L = centrality.BC_MAX_LEVELS


def _bfs_ctes() -> str:
    parts = [
        """lev0 AS MATERIALIZED (
  SELECT h AS s, h AS v, CAST(0 AS BIGINT) AS dist, CAST(1 AS BIGINT) AS sigma
  FROM cth
),
vis0 AS MATERIALIZED (SELECT * FROM lev0)"""
    ]
    for i in range(1, _L + 1):
        parts.append(
            f"""lev{i} AS MATERIALIZED (
  SELECT f.s, e.dst AS v, CAST({i} AS BIGINT) AS dist,
         CAST(sum(f.sigma) AS BIGINT) AS sigma
  FROM lev{i - 1} f JOIN ctsym e ON f.v = e.src
  WHERE NOT EXISTS (SELECT 1 FROM vis{i - 1} x
                    WHERE x.s = f.s AND x.v = e.dst)
  GROUP BY f.s, e.dst
),
vis{i} AS MATERIALIZED (
  SELECT * FROM vis{i - 1} UNION ALL SELECT * FROM lev{i}
)"""
        )
    return ",\n".join(parts)


@query(
    "cent_betweenness",
    oracle=f"""
    WITH {_GRAPH_CTE},
    {_bfs_ctes()},
    ctcon AS (
      SELECT a.v AS vertex,
             CAST(sum((a.sigma * b.sigma * {centrality.BC_SCALE}) // c.sigma)
                  AS BIGINT) AS bc_scaled
      FROM vis{_L} a
      JOIN vis{_L} b ON b.s = a.v
      JOIN vis{_L} c ON c.s = a.s AND c.v = b.v
      WHERE a.s < b.v AND a.v <> a.s AND a.v <> b.v
        AND a.dist + b.dist = c.dist
      GROUP BY a.v
    )
    SELECT cth.h AS vertex, CAST(coalesce(ctcon.bc_scaled, 0) AS BIGINT) AS bc_scaled
    FROM cth LEFT JOIN ctcon ON ctcon.vertex = cth.h
    """,
)
def cent_betweenness(spark, sf_dir):
    """Exact betweenness in integer micro-units: simultaneous-frontier
    BFS + the sigma-product pair identity, vs the same recurrence
    unrolled as 8 anti-joined BFS levels
    (operators/centrality.py betweenness_scaled)."""
    docs = load_table(spark, sf_dir, "documents")
    return centrality.betweenness_scaled(weblinks.synth_farm_host_edges(docs))


@query(
    "cent_closeness",
    oracle=f"""
    WITH {_GRAPH_CTE},
    {_bfs_ctes()},
    ctcl AS (
      SELECT s AS vertex, CAST(sum(dist) AS BIGINT) AS total_dist,
             count(*) AS nr
      FROM vis{_L} WHERE dist > 0 GROUP BY s
    )
    SELECT vertex, total_dist,
           CAST((nr * {centrality.BC_SCALE}) // total_dist AS BIGINT)
             AS closeness_scaled
    FROM ctcl
    """,
)
def cent_closeness(spark, sf_dir):
    """Exact closeness centrality in integer micro-units from the
    shared multi-source BFS (operators/centrality.py
    closeness_scaled)."""
    docs = load_table(spark, sf_dir, "documents")
    return centrality.closeness_scaled(weblinks.synth_farm_host_edges(docs))


@query(
    "cent_eccentricity",
    oracle=f"""
    WITH {_GRAPH_CTE},
    {_bfs_ctes()},
    ctec AS (
      SELECT s AS vertex, CAST(max(dist) AS BIGINT) AS ecc
      FROM vis{_L} GROUP BY s
    ),
    ctbd AS (SELECT min(ecc) AS radius, max(ecc) AS diameter FROM ctec)
    SELECT vertex, ecc,
           CAST(CASE WHEN ecc = radius THEN 1 ELSE 0 END AS BIGINT)
             AS is_central,
           CAST(CASE WHEN ecc = diameter THEN 1 ELSE 0 END AS BIGINT)
             AS is_peripheral
    FROM ctec CROSS JOIN ctbd
    """,
)
def cent_eccentricity(spark, sf_dir):
    """Eccentricity + center/periphery flags, the radius/diameter
    scalars folded back by broadcast-of-aggregate
    (operators/centrality.py eccentricity)."""
    docs = load_table(spark, sf_dir, "documents")
    return centrality.eccentricity(weblinks.synth_farm_host_edges(docs))


@query(
    "cent_harmonic_exact",
    oracle=f"""
    WITH {_GRAPH_CTE},
    {_bfs_ctes()}
    SELECT s AS vertex,
           CAST(sum({centrality.BC_SCALE} // dist) AS BIGINT)
             AS harmonic_scaled
    FROM vis{_L} WHERE dist > 0 GROUP BY s
    """,
)
def cent_harmonic_exact(spark, sf_dir):
    """Exact harmonic centrality (per-distance floored reciprocals) —
    the ground-truth harness for the HyperBall-approximated family
    (operators/centrality.py harmonic_exact)."""
    docs = load_table(spark, sf_dir, "documents")
    return centrality.harmonic_exact(weblinks.synth_farm_host_edges(docs))


# --- Brandes-Pich sampled betweenness --------------------------------

_BSM = centrality.BC_SAMPLE_MOD
_BSR = centrality.BC_SAMPLE_REM
_BSC = centrality.BC_SCALE


def _delta_ctes() -> str:
    parts = [
        f"""bsv AS MATERIALIZED (SELECT * FROM vis{_L} WHERE s % {_BSM} = {_BSR}),
bsd{_L} AS (SELECT s, v, CAST(0 AS BIGINT) AS delta
            FROM bsv WHERE dist = {_L})"""
    ]
    for d in range(_L - 1, 0, -1):
        parts.append(
            f"""bsd{d} AS MATERIALIZED (
  SELECT cur.s, cur.v,
         CAST(coalesce(sum((cur.sigma * ({_BSC} + coalesce(dn.delta, 0)))
                           // nx.sigma), 0) AS BIGINT) AS delta
  FROM (SELECT s, v, sigma FROM bsv WHERE dist = {d}) cur
  LEFT JOIN ctsym e ON e.src = cur.v
  LEFT JOIN (SELECT s, v, sigma FROM bsv WHERE dist = {d + 1}) nx
    ON nx.s = cur.s AND nx.v = e.dst
  LEFT JOIN bsd{d + 1} dn ON dn.s = nx.s AND dn.v = nx.v
  GROUP BY cur.s, cur.v
)"""
        )
    return ",\n".join(parts)


_DEP_UNION = "\nUNION ALL\n".join(
    f"SELECT s, v, delta FROM bsd{d}" for d in range(1, _L + 1)
)


@query(
    "cent_betweenness_sampled",
    oracle=f"""
    WITH {_GRAPH_CTE},
    {_bfs_ctes()},
    {_delta_ctes()},
    bsdep AS (
      SELECT v AS vertex, CAST(sum(delta) AS BIGINT) AS dep_scaled
      FROM ({_DEP_UNION}) GROUP BY v
    ),
    bsn AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN h % {_BSM} = {_BSR} THEN 1 ELSE 0 END)
                        AS BIGINT) AS ns
            FROM cth)
    SELECT cth.h AS vertex,
           CAST(coalesce(d.dep_scaled, 0) AS BIGINT) AS dep_scaled,
           CAST(coalesce(d.dep_scaled, 0) * bsn.n // bsn.ns AS BIGINT)
             AS est_scaled
    FROM cth LEFT JOIN bsdep d ON d.vertex = cth.h CROSS JOIN bsn
    """,
)
def cent_betweenness_sampled(spark, sf_dir):
    """Brandes-Pich pivot-sampled betweenness: sigma BFS from the
    pinned pivot class only, true Brandes backward dependency
    accumulation per level, n/|S| scale-up — the pivot-grain scale
    path for cent_betweenness
    (operators/centrality.py betweenness_sampled)."""
    docs = load_table(spark, sf_dir, "documents")
    return centrality.betweenness_sampled(weblinks.synth_farm_host_edges(docs))
